"""Implementation dispatch: Pallas TPU kernels vs jnp reference.

Selection policy (overridable with env ``POMS_TPU_IMPL=jnp|pallas``):
use the Pallas kernels when running on a TPU backend with a
Mosaic-supported dtype (f32/bf16, ≤3D); otherwise the jnp reference path
(which is also the f64 path — SURVEY.md §7.2.1).

All entry points take the **offset-major** band (``band_t[k..., i...]`` —
see poms_tpu/core/matrix.py for why this is the TPU-native layout).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from poms_tpu.ops.spmv import spmv_banded_jnp, spmv_offdiag_jnp

__all__ = ["use_pallas", "spmv", "residual", "jacobi", "rbgs_color"]

_PALLAS_DTYPES = (jnp.dtype("float32"), jnp.dtype("bfloat16"))


def use_pallas(dtype, ndim: int) -> bool:
    force = os.environ.get("POMS_TPU_IMPL")
    if force == "jnp":
        return False
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    ok = jnp.dtype(dtype) in _PALLAS_DTYPES and 1 <= ndim <= 3
    if force == "pallas":
        return ok
    return on_tpu and ok


def spmv(band_t, x_pad, npts, pads):
    if use_pallas(band_t.dtype, len(npts)):
        from poms_tpu.ops.pallas.spmv import spmv_banded_pallas

        return spmv_banded_pallas(band_t, x_pad, npts, pads)
    return spmv_banded_jnp(band_t, x_pad, npts, pads)


def residual(band_t, x_pad, b_int, npts, pads):
    """r = b − A·x (fused on TPU)."""
    if use_pallas(band_t.dtype, len(npts)):
        from poms_tpu.ops.pallas.spmv import residual_fused_pallas

        return residual_fused_pallas(band_t, x_pad, b_int, npts, pads)
    return b_int - spmv_banded_jnp(band_t, x_pad, npts, pads)


def jacobi(band_t, x_pad, b_int, omega, npts, pads):
    """x' = x + ω (b − A x)/diag  (single fused pass on TPU)."""
    if use_pallas(band_t.dtype, len(npts)):
        from poms_tpu.ops.pallas.spmv import jacobi_fused_pallas

        return jacobi_fused_pallas(band_t, x_pad, b_int, omega, npts, pads)
    diag = band_t[tuple(pads)]
    x_int = x_pad[tuple(slice(p, p + n) for n, p in zip(npts, pads))]
    Ax = spmv_banded_jnp(band_t, x_pad, npts, pads)
    return x_int + omega * (b_int - Ax) / diag


def rbgs_color(band_t, x_pad, b_int, omega, color, npts, pads, starts=None):
    """One RB-GS color phase: masked hybrid-GS update on color-``color``
    points (fused Pallas kernel on TPU — see rbgs_color_pallas)."""
    if use_pallas(band_t.dtype, len(npts)):
        from poms_tpu.ops.pallas.spmv import rbgs_color_pallas

        return rbgs_color_pallas(band_t, x_pad, b_int, omega, color, npts,
                                 pads, starts=starts)
    from poms_tpu.mg.smoother import color_mask

    diag = band_t[tuple(pads)]
    x_int = x_pad[tuple(slice(p, p + n) for n, p in zip(npts, pads))]
    s = spmv_offdiag_jnp(band_t, x_pad, npts, pads)
    gs = (b_int - s) / diag
    mask = color_mask(npts, color, starts)
    return jnp.where(mask, (1.0 - omega) * x_int + omega * gs, x_int)
