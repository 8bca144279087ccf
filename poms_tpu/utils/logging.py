"""Structured convergence logging (SURVEY.md §5.5).

The reference prints residual histories per cycle; those histories ARE the
comparison artifact [B:L5].  Here they are machine-checkable: JSON lines of
``{cycle, residual, rho, wall_s}`` plus a header record, written to a file
or any stream.  tests and the oracle-swap path (SURVEY.md §7.4) read these.
"""
from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional

__all__ = ["ConvergenceLogger"]


class ConvergenceLogger:
    def __init__(self, stream: Optional[IO] = None, path: Optional[str] = None,
                 meta: Optional[dict] = None):
        if path is not None:
            self._fh = open(path, "w")
            self._own = True
        else:
            self._fh = stream or sys.stdout
            self._own = False
        self._t0 = time.perf_counter()
        if meta:
            self._emit({"event": "start", **meta})

    def _emit(self, rec: dict):
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def log_cycle(self, cycle: int, residual: float, rho: float,
                  wall_s: float, **extra):
        self._emit({"event": "cycle", "cycle": cycle, "residual": residual,
                    "rho": rho, "wall_s": wall_s,
                    "elapsed_s": time.perf_counter() - self._t0, **extra})

    def close(self, **summary):
        if summary:
            self._emit({"event": "done", **summary})
        if self._own:
            self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
