"""Smoothers: weighted Jacobi, red-black and lexicographic Gauss–Seidel.

SURVEY.md §2 C7 / BASELINE.json configs 1 & 3.  All smoothers are defined on
the banded stencil format and are *exactly* mirrored by the numpy oracle
(:mod:`poms_tpu.oracle`) so residual histories can be compared bit-for-bit
in f64 (SURVEY.md §7.4).

Update rules (these define the semantics the oracle matches):

- ``jacobi``:  x ← x + ω D⁻¹ (b − A x)
- ``rbgs``:    for color c in (red=0, black=1):
                 x[c] ← (1−ω) x[c] + ω D⁻¹ (b − (A x)_offdiag)[c]
  using the *current* x (including this sweep's red update when computing
  black).  Note for wide stencils (p ≥ 2) same-color neighbors exist; they
  contribute their pre-update values within a color phase — the standard
  relaxation choice for high-order stencils, applied consistently here and
  in the oracle.
- ``gs_lex``:  true lexicographic Gauss–Seidel/SOR.  Inherently sequential —
  on TPU it runs as a `lax.fori_loop` over rows (correctness/parity path
  only; SURVEY.md §7.2.2 explains why RB is the TPU-parallel smoother).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from poms_tpu.core.matrix import StencilMatrix
from poms_tpu.core.vector import StencilVector
from poms_tpu.ops import dispatch as _ops
from poms_tpu.ops.spmv import spmv_banded_jnp, spmv_offdiag_jnp

__all__ = ["SmootherConfig", "smooth_step", "color_mask",
           "jacobi_step", "rbgs_step", "gs_lex_step"]


@dataclass(frozen=True)
class SmootherConfig:
    kind: str = "jacobi"       # 'jacobi' | 'rbgs' | 'gs_lex'
    omega: float = 2.0 / 3.0   # damping / SOR factor


def color_mask(npts: Tuple[int, ...], color: int,
               starts: Tuple[int, ...] | None = None) -> jnp.ndarray:
    """Boolean mask of grid points with (Σ global index) % 2 == color.

    ``starts`` are the global offsets of this block (distributed red-black:
    the color of a point depends on its *global* index — SURVEY.md §7.1.6).
    """
    d = len(npts)
    total = None
    for a, n in enumerate(npts):
        idx = jax.lax.broadcasted_iota(jnp.int32, npts, a)
        if starts is not None:
            idx = idx + starts[a]
        total = idx if total is None else total + idx
    return (total % 2) == color


def jacobi_step(A: StencilMatrix, x: StencilVector, b: StencilVector,
                omega: float) -> StencilVector:
    sp = A.space
    xg = x.update_ghost_regions()
    x_new = _ops.jacobi(A.band, xg.data, b.interior, omega, sp.npts, sp.pads)
    return StencilVector.from_interior(sp, x_new)


def rbgs_step(A: StencilMatrix, x: StencilVector, b: StencilVector,
              omega: float,
              starts: Tuple[int, ...] | None = None) -> StencilVector:
    sp = A.space
    diag = A.diagonal()
    for color in (0, 1):
        mask = color_mask(sp.npts, color, starts)
        xg = x.update_ghost_regions()
        s = spmv_offdiag_jnp(A.band, xg.data, sp.npts, sp.pads)
        gs_val = (b.interior - s) / diag
        x_new = jnp.where(mask, (1.0 - omega) * x.interior + omega * gs_val,
                          x.interior)
        x = StencilVector.from_interior(sp, x_new)
    return x


@partial(jax.jit, static_argnames=("npts", "pads"), donate_argnums=(1,))
def _gs_lex_sweep(band, x_pad, b_int, diag, omega, npts, pads):
    nd = len(npts)
    n_total = math.prod(npts)
    win = tuple(2 * p + 1 for p in pads)
    center = tuple(pads)

    def body(flat, x_pad):
        # decode flat -> multi-index (C order)
        idx = []
        rem = flat
        for a in reversed(range(nd)):
            idx.insert(0, rem % npts[a])
            rem = rem // npts[a]
        idx = tuple(idx)
        window = jax.lax.dynamic_slice(x_pad, idx, win)
        row = jax.lax.dynamic_slice(band, idx + (0,) * nd, (1,) * nd + win)
        row = row.reshape(win)
        s = jnp.sum(row * window) - row[center] * window[center]
        d = diag[idx]
        bval = b_int[idx]
        old = window[center]
        new = (1.0 - omega) * old + omega * (bval - s) / d
        return jax.lax.dynamic_update_slice(
            x_pad, new.reshape((1,) * nd),
            tuple(i + p for i, p in zip(idx, pads)))

    return jax.lax.fori_loop(0, n_total, body, x_pad)


def gs_lex_step(A: StencilMatrix, x: StencilVector, b: StencilVector,
                omega: float) -> StencilVector:
    """Sequential lexicographic SOR sweep (non-periodic only)."""
    sp = A.space
    if any(sp.periodic):
        raise NotImplementedError("gs_lex requires non-periodic boundaries")
    xg = x.update_ghost_regions()
    x_pad = _gs_lex_sweep(A.band, xg.data, b.interior, A.diagonal(),
                          jnp.asarray(omega, sp.dtype), sp.npts, sp.pads)
    return StencilVector(sp, x_pad)


def smooth_step(A: StencilMatrix, x: StencilVector, b: StencilVector,
                cfg: SmootherConfig,
                starts: Tuple[int, ...] | None = None) -> StencilVector:
    if cfg.kind == "jacobi":
        return jacobi_step(A, x, b, cfg.omega)
    if cfg.kind == "rbgs":
        return rbgs_step(A, x, b, cfg.omega, starts)
    if cfg.kind == "gs_lex":
        return gs_lex_step(A, x, b, cfg.omega)
    raise ValueError(f"unknown smoother {cfg.kind!r}")
