"""Pallas TPU kernels: banded stencil SpMV and fused smoother sweeps.

TPU-native equivalents of the reference's pyccel-generated Fortran kernels
(SURVEY.md §2 C5/C7).  The workload is HBM-bound: the band coefficients
((2p+1)^d × 4 B per grid point) dominate traffic, so the kernels

  - stream band blocks through VMEM via the Pallas grid pipeline
    (auto double-buffered),
  - DMA the (tile + 2p)-halo window of the ghost-padded input vector from
    HBM per tile (x traffic is (2p+1)^d× smaller than band traffic, so a
    synchronous window copy costs little),
  - accumulate the (2p+1)^d shifted multiply-adds on the VPU,
  - optionally fuse the Jacobi update  x + ω(b − Ax)/diag  or the residual
    b − Ax into the same pass (each fusion saves a full vector round-trip
    to HBM — SURVEY.md §7.0).

Layouts: 2D/3D grids map the last dim to lanes and the second-to-last to
sublanes.  1D problems are "planked" into an overlapping 2D layout
(x2[r, c] = x[r·W + c], W = 128 columns + 2p halo columns) which turns the
1D stencil into a uniform 2D one — see :func:`_plank_1d`.

f32 (and bf16) only: Mosaic has no f64; the f64 path stays on the jnp
implementation (SURVEY.md §7.2.1).
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poms_tpu.ops.spmv import spmv_banded_jnp

__all__ = ["spmv_banded_pallas", "jacobi_fused_pallas",
           "residual_fused_pallas"]


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# core 2D/3D kernel
# ---------------------------------------------------------------------------

def _make_kernel(nd, tile, pads, mode, win_al):
    """Kernel body for mode in {'spmv', 'residual'} ('jacobi' uses the
    scalar-prefetch variant below)."""
    win = tuple(2 * p + 1 for p in pads)

    def kernel(*refs):
        if mode == "spmv":
            x_hbm, band_ref, out_ref, xw, sem = refs
        else:
            x_hbm, band_ref, b_ref, out_ref, xw, sem = refs
        ids = [pl.program_id(a) for a in range(nd)]
        src = x_hbm.at[tuple(pl.ds(ids[a] * tile[a], win_al[a])
                             for a in range(nd))]
        dma = pltpu.make_async_copy(src, xw, sem)
        dma.start()
        dma.wait()
        acc = None
        for k in np.ndindex(*win):
            coeff = band_ref[(...,) + k]
            shifted = xw[tuple(slice(k[a], k[a] + tile[a])
                               for a in range(nd))]
            term = coeff * shifted
            acc = term if acc is None else acc + term
        if mode == "spmv":
            out_ref[...] = acc
        else:
            out_ref[...] = b_ref[...] - acc

    return kernel


def _make_kernel_omega(nd, tile, pads, win_al):
    """Jacobi kernel with omega passed via scalar-prefetch SMEM ref."""
    win = tuple(2 * p + 1 for p in pads)
    diag_idx = tuple(pads)

    def kernel(omega_ref, x_hbm, band_ref, b_ref, out_ref, xw, sem):
        ids = [pl.program_id(a) for a in range(nd)]
        src = x_hbm.at[tuple(pl.ds(ids[a] * tile[a], win_al[a])
                             for a in range(nd))]
        dma = pltpu.make_async_copy(src, xw, sem)
        dma.start()
        dma.wait()
        acc = None
        for k in np.ndindex(*win):
            coeff = band_ref[(...,) + k]
            shifted = xw[tuple(slice(k[a], k[a] + tile[a])
                               for a in range(nd))]
            term = coeff * shifted
            acc = term if acc is None else acc + term
        center = xw[tuple(slice(pads[a], pads[a] + tile[a])
                          for a in range(nd))]
        diag = band_ref[(...,) + diag_idx]
        omega = omega_ref[0]
        out_ref[...] = center + omega * (b_ref[...] - acc) / diag

    return kernel


def _choose_tiles(npts, pads, itemsize) -> Tuple[int, ...]:
    """Tile sizes: last dim → lanes (≤256), second-to-last → sublanes,
    leading dims 1.  Budget: band block ((2p+1)^d · tile · itemsize) must
    double-buffer comfortably in ~16 MB VMEM."""
    nd = len(npts)
    terms = math.prod(2 * p + 1 for p in pads)
    tile = [1] * nd
    tile[-1] = min(256, _cdiv(npts[-1], 128) * 128 if npts[-1] >= 128
                   else npts[-1])
    if nd >= 2:
        budget = 4 * 1024 * 1024  # bytes for one band block
        t2 = budget // (terms * tile[-1] * itemsize)
        t2 = max(8, min(int(t2), 128))
        t2 = (t2 // 8) * 8  # sublane-aligned
        tile[-2] = t2
    return tuple(tile)


def _window_align(nd):
    """Mosaic memref_slice alignment for DMA window sizes (sublane, lane)."""
    align = [1] * nd
    align[-1] = 128
    if nd >= 2:
        align[-2] = 8
    return align


def _pad_operands(band, x_pad, b, npts, pads, tile):
    """Pad grid dims to tile multiples (zero band rows → zero output) and
    give x enough end-padding for alignment-rounded DMA windows."""
    nd = len(npts)
    N = tuple(_cdiv(npts[a], tile[a]) * tile[a] for a in range(nd))
    align = _window_align(nd)
    win = [tile[a] + 2 * pads[a] for a in range(nd)]
    win_al = [_cdiv(win[a], align[a]) * align[a] for a in range(nd)]
    extra = [win_al[a] - win[a] for a in range(nd)]
    if N != tuple(npts):
        band = jnp.pad(band, [(0, N[a] - npts[a]) for a in range(nd)]
                       + [(0, 0)] * nd)
        if b is not None:
            b = jnp.pad(b, [(0, N[a] - npts[a]) for a in range(nd)])
    x_extra = [(0, N[a] - npts[a] + extra[a]) for a in range(nd)]
    if any(e != (0, 0) for e in x_extra):
        x_pad = jnp.pad(x_pad, x_extra)
    return band, x_pad, b, N, tuple(win_al)


@functools.partial(jax.jit,
                   static_argnames=("npts", "pads", "mode", "interpret"))
def _stencil_call(band, x_pad, b, omega, npts, pads, mode, interpret=False):
    nd = len(npts)
    dtype = band.dtype
    itemsize = jnp.dtype(dtype).itemsize
    tile = _choose_tiles(npts, pads, itemsize)
    band, x_pad, b, N, win_al = _pad_operands(band, x_pad, b, npts, pads,
                                              tile)
    grid = tuple(N[a] // tile[a] for a in range(nd))
    win = tuple(2 * p + 1 for p in pads)

    # index maps take (*grid_ids, *scalar_prefetch_refs); use only the ids
    band_spec = pl.BlockSpec(
        tile + win, lambda *ids: tuple(ids[:nd]) + (0,) * nd,
        memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec(tile, lambda *ids: tuple(ids[:nd]),
                            memory_space=pltpu.VMEM)
    # x must stay in HBM: halo windows are inherently unaligned, and DMA
    # slices of *tiled VMEM* memrefs must be (8,128)-aligned (Mosaic), while
    # HBM sources allow arbitrary windows.
    x_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    scratch = [
        pltpu.VMEM(win_al, dtype),
        pltpu.SemaphoreType.DMA,
    ]
    out_shape = jax.ShapeDtypeStruct(N, dtype)

    if mode == "spmv":
        kernel = _make_kernel(nd, tile, pads, "spmv", win_al)
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[x_spec, band_spec],
            out_specs=vec_spec, out_shape=out_shape,
            scratch_shapes=scratch, interpret=interpret,
        )(x_pad, band)
    elif mode == "residual":
        kernel = _make_kernel(nd, tile, pads, "residual", win_al)
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[x_spec, band_spec, vec_spec],
            out_specs=vec_spec, out_shape=out_shape,
            scratch_shapes=scratch, interpret=interpret,
        )(x_pad, band, b)
    else:  # jacobi
        kernel = _make_kernel_omega(nd, tile, pads, win_al)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[x_spec, band_spec, vec_spec],
            out_specs=vec_spec, scratch_shapes=scratch)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(jnp.asarray([omega], dtype), x_pad, band, b)
    if N != tuple(npts):
        out = out[tuple(slice(0, n) for n in npts)]
    return out


# ---------------------------------------------------------------------------
# chunked 3D kernel: grid over (tiles..., k1-chunks), out-block accumulation
# ---------------------------------------------------------------------------
# A fully unrolled 3D cubic kernel has (2p+1)^3 = 343 shifted MACs, which
# blows up Mosaic compile memory (observed: compile helper OOM-killed).  So
# the leading band offset k1 becomes a grid dimension: each grid step streams
# one (tile, 1, 2p+1, 2p+1) band chunk and accumulates (2p+1)^2 MACs into
# the revisited output block (the classic matmul-K-loop pattern); the x halo
# window is DMA'd once per output tile at k1 == 0 and reused by all chunks.


def _make_kernel_3d_chunked(tile, pads, mode, win_al, kc):
    p1, p2, p3 = pads
    w2, w3 = 2 * p2 + 1, 2 * p3 + 1

    def body_common(k, x_hbm, band_ref, out_ref, xw, sem):
        ids = [pl.program_id(a) for a in range(3)]

        @pl.when(k == 0)
        def _():
            src = x_hbm.at[tuple(pl.ds(ids[a] * tile[a], win_al[a])
                                 for a in range(3))]
            dma = pltpu.make_async_copy(src, xw, sem)
            dma.start()
            dma.wait()

        acc = None
        for k2 in range(w2):
            for k3 in range(w3):
                coeff = band_ref[(0, slice(None), slice(None), 0, k2, k3)]
                shifted = xw[pl.ds(k, 1), pl.ds(k2, tile[1]),
                             pl.ds(k3, tile[2])].reshape(tile[1], tile[2])
                term = coeff * shifted
                acc = term if acc is None else acc + term
        return acc.reshape(1, tile[1], tile[2])

    if mode in ("spmv", "residual"):
        def kernel(x_hbm, band_ref, *rest):
            if mode == "spmv":
                out_ref, xw, sem = rest
            else:
                b_ref, out_ref, xw, sem = rest
            k = pl.program_id(3)
            acc = body_common(k, x_hbm, band_ref, out_ref, xw, sem)

            @pl.when(k == 0)
            def _():
                out_ref[...] = acc

            @pl.when(k > 0)
            def _():
                out_ref[...] = out_ref[...] + acc

            if mode == "residual":
                @pl.when(k == kc - 1)
                def _():
                    out_ref[...] = b_ref[...] - out_ref[...]
        return kernel

    # jacobi: needs diag + b + omega; finalize on the last chunk
    def kernel(omega_ref, x_hbm, band_ref, b_ref, diag_ref, *rest):
        out_ref, xw, sem = rest
        k = pl.program_id(3)
        acc = body_common(k, x_hbm, band_ref, out_ref, xw, sem)

        @pl.when(k == 0)
        def _():
            out_ref[...] = acc

        @pl.when(k > 0)
        def _():
            out_ref[...] = out_ref[...] + acc

        @pl.when(k == kc - 1)
        def _():
            center = xw[pl.ds(p1, 1), pl.ds(p2, tile[1]),
                        pl.ds(p3, tile[2])].reshape(1, tile[1], tile[2])
            omega = omega_ref[0]
            out_ref[...] = center + omega * (
                b_ref[...] - out_ref[...]) / diag_ref[...]
    return kernel


def _stencil_call_3d(band, x_pad, b, omega, npts, pads, mode, interpret):
    dtype = band.dtype
    itemsize = jnp.dtype(dtype).itemsize
    kc = 2 * pads[0] + 1
    w2, w3 = 2 * pads[1] + 1, 2 * pads[2] + 1
    # tiles: T1 = 1; T3 = lanes; T2 from a per-chunk VMEM budget
    t3 = min(256, _cdiv(npts[-1], 128) * 128 if npts[-1] >= 128 else
             _cdiv(npts[-1], 8) * 8)
    budget = 2 * 1024 * 1024
    t2 = budget // (w2 * w3 * t3 * itemsize)
    t2 = max(8, min((t2 // 8) * 8, 128))
    tile = (1, t2, t3)
    band, x_pad, b, N, win_al = _pad_operands(band, x_pad, b, npts, pads,
                                              tile)
    diag = band[(...,) + tuple(pads)] if mode == "jacobi" else None
    grid = (N[0] // tile[0], N[1] // tile[1], N[2] // tile[2], kc)

    band_spec = pl.BlockSpec(
        (1, t2, t3, 1, w2, w3),
        lambda i, j, l, k, *_: (i, j, l, k, 0, 0),
        memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, t2, t3), lambda i, j, l, k, *_: (i, j, l),
                            memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    scratch = [pltpu.VMEM(win_al, dtype), pltpu.SemaphoreType.DMA]
    out_shape = jax.ShapeDtypeStruct(N, dtype)
    kernel = _make_kernel_3d_chunked(tile, pads, mode, win_al, kc)

    if mode == "spmv":
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=[x_spec, band_spec],
            out_specs=vec_spec, out_shape=out_shape,
            scratch_shapes=scratch, interpret=interpret,
        )(x_pad, band)
    elif mode == "residual":
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=[x_spec, band_spec, vec_spec],
            out_specs=vec_spec, out_shape=out_shape,
            scratch_shapes=scratch, interpret=interpret,
        )(x_pad, band, b)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[x_spec, band_spec, vec_spec, vec_spec],
            out_specs=vec_spec, scratch_shapes=scratch)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(jnp.asarray([omega], dtype), x_pad, band, b, diag)
    if N != tuple(npts):
        out = out[tuple(slice(0, n) for n in npts)]
    return out


# ---------------------------------------------------------------------------
# 1D planking
# ---------------------------------------------------------------------------

_PLANK_W = 512


def _plank_1d(band, x_pad, b, n, p):
    """Re-layout a 1D stencil problem as an overlapping-row 2D one."""
    W = _PLANK_W
    R = _cdiv(n, W)
    n_pad = R * W
    if n_pad != n:
        band = jnp.pad(band, [(0, n_pad - n), (0, 0)])
        x_pad = jnp.pad(x_pad, [(0, n_pad - n)])
        if b is not None:
            b = jnp.pad(b, [(0, n_pad - n)])
    band2 = band.reshape(R, W, 1, 2 * p + 1)
    # overlapping x rows: x2[r, c] = x_pad_flat[r*W + c], c in [0, W + 2p)
    idx = (jnp.arange(R) * W)[:, None] + jnp.arange(W + 2 * p)[None, :]
    x2 = x_pad[idx]          # (R, W + 2p): row r already includes halos
    b2 = b.reshape(R, W) if b is not None else None
    return band2, x2, b2, R, W, n_pad


def _unplank(out2, n):
    return out2.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def _dispatch(band, x_pad, b, omega, npts, pads, mode, interpret):
    nd = len(npts)
    if nd == 1:
        n, p = npts[0], pads[0]
        band2, x2, b2, R, W, n_pad = _plank_1d(band, x_pad, b, n, p)
        # 2D call with pads (0, p): halo only along lanes; rows independent
        out2 = _stencil_call(band2, x2, b2, omega, (R, W), (0, p), mode,
                             interpret)
        return _unplank(out2, n)
    if nd > 3:
        raise NotImplementedError("pallas kernels cover 1D/2D/3D")
    if nd == 3:
        return _stencil_call_3d(band, x_pad, b, omega, npts, pads, mode,
                                interpret)
    return _stencil_call(band, x_pad, b, omega, npts, pads, mode, interpret)


def spmv_banded_pallas(band, x_pad, npts, pads, interpret=False):
    """out[i] = Σ_k band[i,k] · x_pad[i+k] — Pallas twin of
    :func:`poms_tpu.ops.spmv.spmv_banded_jnp` (bit-compatible in f32)."""
    return _dispatch(band, x_pad, None, None, tuple(npts), tuple(pads),
                     "spmv", interpret)


def residual_fused_pallas(band, x_pad, b, npts, pads, interpret=False):
    """r = b − A·x in one fused pass."""
    return _dispatch(band, x_pad, b, None, tuple(npts), tuple(pads),
                     "residual", interpret)


def jacobi_fused_pallas(band, x_pad, b, omega, npts, pads, interpret=False):
    """x' = x + ω·(b − A·x)/diag(A) in one fused pass (SURVEY.md §7.0)."""
    return _dispatch(band, x_pad, b, float(omega), tuple(npts), tuple(pads),
                     "jacobi", interpret)
