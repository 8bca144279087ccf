"""Checkpoint/resume of solver state between cycles (SURVEY.md §5.3/5.4).

Solver state is tiny (one vector + history), so a plain ``npz`` dump at
cycle granularity gives restart-on-failure without orbax machinery.  The
file records the solution iterate, the residual history, the cycle index
and enough problem metadata to validate a resume.
"""
from __future__ import annotations

import json
from typing import Tuple

import numpy as np

__all__ = ["save_solver_state", "load_solver_state"]


def save_solver_state(path: str, x_interior, residuals, iteration: int,
                      meta: dict | None = None) -> None:
    np.savez_compressed(
        path,
        x=np.asarray(x_interior),
        residuals=np.asarray(residuals, np.float64),
        iteration=np.int64(iteration),
        meta=np.array(json.dumps(meta or {})),
    )


def load_solver_state(path: str) -> Tuple[np.ndarray, list, int, dict]:
    with np.load(path, allow_pickle=False) as z:
        x = z["x"]
        residuals = list(z["residuals"])
        iteration = int(z["iteration"])
        meta = json.loads(str(z["meta"]))
    return x, residuals, iteration, meta
