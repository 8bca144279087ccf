"""ctypes loader/builder for the native C++ SpGEMM kernel.

Builds ``cpp/spgemm.cpp`` with g++ on first use (cached as ``_spgemm.so``
next to the source).  Falls back silently to the numpy implementation when
no compiler is available or ``POMS_TPU_NATIVE=0``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["native_available", "csr_spgemm_native"]

_HERE = Path(__file__).parent
_SRC = _HERE / "cpp" / "spgemm.cpp"
_SO = _HERE / "cpp" / "_spgemm.so"
_LIB = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return ctypes.CDLL(str(_SO))
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           str(_SRC), "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return ctypes.CDLL(str(_SO))


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("POMS_TPU_NATIVE", "1") == "0":
        return None
    try:
        lib = _build()
    except OSError:
        lib = None
    if lib is not None:
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.spgemm_pass1.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                     i64p, i64p, i64p, i64p, i64p]
        lib.spgemm_pass2.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                     i64p, i64p, f64p, i64p, i64p, f64p,
                                     i64p, i64p, f64p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def _p64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _pf64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def csr_spgemm_native(Ap, Aj, Ax, Bp, Bj, Bx, n_rows, n_cols_B):
    """C = A @ B; returns (Cp, Cj, Cx) with rows sorted by column."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native spgemm unavailable")
    Ap = np.ascontiguousarray(Ap, np.int64)
    Aj = np.ascontiguousarray(Aj, np.int64)
    Ax = np.ascontiguousarray(Ax, np.float64)
    Bp = np.ascontiguousarray(Bp, np.int64)
    Bj = np.ascontiguousarray(Bj, np.int64)
    Bx = np.ascontiguousarray(Bx, np.float64)
    Cp = np.zeros(n_rows + 1, np.int64)
    lib.spgemm_pass1(n_rows, n_cols_B, _p64(Ap), _p64(Aj), _p64(Bp),
                     _p64(Bj), _p64(Cp))
    nnz = int(Cp[-1])
    Cj = np.zeros(nnz, np.int64)
    Cx = np.zeros(nnz, np.float64)
    lib.spgemm_pass2(n_rows, n_cols_B, _p64(Ap), _p64(Aj), _pf64(Ax),
                     _p64(Bp), _p64(Bj), _pf64(Bx), _p64(Cp), _p64(Cj),
                     _pf64(Cx))
    # canonicalize: sort each row by column (key = row * n_cols + col)
    rows = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(Cp))
    key = rows * np.int64(n_cols_B) + Cj
    order = np.argsort(key, kind="stable")
    return Cp, Cj[order], Cx[order]
