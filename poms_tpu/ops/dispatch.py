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

__all__ = ["use_pallas", "spmv", "residual", "jacobi"]

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
