"""Pallas TPU kernels: banded stencil SpMV and fused smoother sweeps.

TPU-native equivalents of the reference's pyccel-generated Fortran kernels
(SURVEY.md §2 C5/C7).  The workload is HBM-bound: the band coefficients
((2p+1)^d × 4 B per grid point) dominate traffic, so the kernel

  - streams band chunks through VMEM via the Pallas grid pipeline
    (auto double-buffered),
  - DMAs the (tile + 2p)-halo window of the ghost-padded input vector from
    HBM once per output tile (x traffic is (2p+1)^d× smaller than band
    traffic, so the synchronous window copy costs little),
  - accumulates the (2p+1)^d shifted multiply-adds on the VPU,
  - optionally fuses the Jacobi update  x + ω(b − Ax)/diag  or the residual
    b − Ax into the same pass (each fusion saves a full vector round-trip
    to HBM — SURVEY.md §7.0).

Band layout: **offset-major** (``band_t[k..., i...]``, shape win + grid —
see core/matrix.py).  Each coefficient plane ``band_t[k]`` is then a
contiguous (sublane × lane) tile.  The grid-major layout puts the 49/343
offsets in the lane dim and Mosaic scalarizes every coefficient read
(measured: compile stall — the round-1 blocker this file previously had).

ONE engine serves all dimensionalities — the chunked "3D" kernel:

  - 3D runs natively: grid (I, J, L, K1) where K1 walks the leading band
    offset (the matmul-K-loop pattern: 343 fully-unrolled MACs blow up
    Mosaic compile memory, (2p+1)² per chunk do not), accumulating into a
    revisited output block;
  - 2D lifts to (1, n1, n2) with pads (0, p1, p2) (K1 degenerates to one
    chunk);
  - 1D planks into overlapping rows (x2[r, c] = x[r·W + c]) and lifts.

Mosaic empirics baked in (measured on v5e this round): HBM DMA slice starts
in the lane dim must be *provably* divisible by 128, and in-VMEM shifted
window reads compile fast only when the lane slice is exactly one native
tile (128 lanes) wide — (8,256)/(32,128)-style 2D tiles stall the compiler
for minutes.  Hence: lane tile == 128 always, operands zero-padded up
(zero band rows produce zero output rows, sliced off on return).

f32 (and bf16) only: Mosaic has no f64; the f64 path stays on the jnp
implementation (SURVEY.md §7.2.1).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spmv_banded_pallas", "jacobi_fused_pallas",
           "residual_fused_pallas"]

_LANE = 128
_SUB = 8


def _cdiv(a, b):
    return -(-a // b)


def _rup(a, b):
    return _cdiv(a, b) * b


# ---------------------------------------------------------------------------
# tiling / padding
# ---------------------------------------------------------------------------

def _choose_tiles(npts, pads, itemsize):
    """(1, t2, 128): lane tile pinned to one native tile (see module doc);
    sublane tile sized so one (1, w2, w3) band chunk fits a ~2 MB VMEM
    budget (the pipeline double-buffers it); leading dim tiles at 1.

    t2 is then shrunk to the smallest tile that keeps the same tile COUNT
    over npts[1], so grid padding (pure wasted band traffic — zero rows are
    still streamed) is at most 7 rows instead of up to t2 − 1.
    """
    w2, w3 = 2 * pads[1] + 1, 2 * pads[2] + 1
    budget = 2 * 1024 * 1024
    t2 = budget // (w2 * w3 * _LANE * itemsize)
    t2 = max(_SUB, min((t2 // _SUB) * _SUB, 256))
    n_tiles = _cdiv(npts[1], t2)
    t2 = _rup(_cdiv(npts[1], n_tiles), _SUB)
    return (1, t2, _LANE)


def _window_sizes(tile, pads):
    """Aligned VMEM scratch window: tile + 2p per dim, lane dim rounded to
    128 and sublane dim to 8 so the HBM→VMEM DMA shape is tileable."""
    win = [2 * pads[0] + 1,
           _rup(tile[1] + 2 * pads[1], _SUB),
           _rup(tile[2] + 2 * pads[2], _LANE)]
    return tuple(win)


def _pad_operands(band_t, x_pad, b, npts, pads, tile):
    """Zero-pad grid dims to tile multiples (zero band rows → zero output)
    and give x enough end-padding for the alignment-rounded DMA windows."""
    nd = 3
    N = tuple(_rup(npts[a], tile[a]) for a in range(nd))
    win_al = _window_sizes(tile, pads)
    extra = [win_al[a] - (tile[a] + 2 * pads[a]) for a in range(nd)]
    extra[0] = 0  # leading window dim is exactly 2p0 + 1 = tile0 + 2p0
    if N != tuple(npts):
        band_t = jnp.pad(band_t, [(0, 0)] * nd
                         + [(0, N[a] - npts[a]) for a in range(nd)])
        if b is not None:
            b = jnp.pad(b, [(0, N[a] - npts[a]) for a in range(nd)])
    x_extra = [(0, N[a] - npts[a] + extra[a]) for a in range(nd)]
    if any(e != (0, 0) for e in x_extra):
        x_pad = jnp.pad(x_pad, x_extra)
    return band_t, x_pad, b, N, win_al


# ---------------------------------------------------------------------------
# chunked kernel: grid over (tiles..., k1-chunks), out-block accumulation
# ---------------------------------------------------------------------------

def _make_kernel(tile, pads, mode, win_al, kc):
    p1, p2, p3 = pads
    w2, w3 = 2 * p2 + 1, 2 * p3 + 1

    def body_common(k, x_hbm, band_ref, xw, sem):
        ids = [pl.program_id(a) for a in range(3)]

        @pl.when(k == 0)
        def _():
            src = x_hbm.at[pl.ds(ids[0] * tile[0], win_al[0]),
                           pl.ds(ids[1] * tile[1], win_al[1]),
                           pl.ds(ids[2] * tile[2], win_al[2])]
            dma = pltpu.make_async_copy(src, xw, sem)
            dma.start()
            dma.wait()

        acc = None
        for k3 in range(w3):
            # ONE lane-offset slice per k3 (the expensive cross-lane-tile
            # relayout), reused by all w2 sublane offsets below
            xs = xw[pl.ds(k, 1), :, pl.ds(k3, tile[2])]
            xs = xs.reshape(win_al[1], tile[2])
            for k2 in range(w2):
                coeff = band_ref[0, k2, k3, 0]          # (t2, t3) contiguous
                shifted = xs[k2:k2 + tile[1], :]        # cheap sublane slice
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
            acc = body_common(k, x_hbm, band_ref, xw, sem)

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
        acc = body_common(k, x_hbm, band_ref, xw, sem)

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


def _stencil_call(band_t, x_pad, b, omega, npts, pads, mode, interpret):
    dtype = band_t.dtype
    itemsize = jnp.dtype(dtype).itemsize
    kc = 2 * pads[0] + 1
    w2, w3 = 2 * pads[1] + 1, 2 * pads[2] + 1
    tile = _choose_tiles(npts, pads, itemsize)
    band_t, x_pad, b, N, win_al = _pad_operands(band_t, x_pad, b, npts,
                                                pads, tile)
    diag = band_t[tuple(pads)] if mode == "jacobi" else None
    grid = (N[0] // tile[0], N[1] // tile[1], N[2] // tile[2], kc)

    band_spec = pl.BlockSpec(
        (1, w2, w3, 1, tile[1], tile[2]),
        lambda i, j, l, k, *_: (k, 0, 0, i, j, l),
        memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, tile[1], tile[2]),
                            lambda i, j, l, k, *_: (i, j, l),
                            memory_space=pltpu.VMEM)
    # x stays in HBM: halo windows overlap between tiles, which BlockSpec
    # pipelining can't express; a manual per-tile DMA can.
    x_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    scratch = [pltpu.VMEM(win_al, dtype), pltpu.SemaphoreType.DMA]
    out_shape = jax.ShapeDtypeStruct(N, dtype)
    kernel = _make_kernel(tile, pads, mode, win_al, kc)

    if mode == "spmv":
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=[x_spec, band_spec],
            out_specs=vec_spec, out_shape=out_shape,
            scratch_shapes=scratch, interpret=interpret,
        )(x_pad, band_t)
    elif mode == "residual":
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=[x_spec, band_spec, vec_spec],
            out_specs=vec_spec, out_shape=out_shape,
            scratch_shapes=scratch, interpret=interpret,
        )(x_pad, band_t, b)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[x_spec, band_spec, vec_spec, vec_spec],
            out_specs=vec_spec, scratch_shapes=scratch)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(jnp.asarray([omega], dtype), x_pad, band_t, b, diag)
    if N != tuple(npts):
        out = out[tuple(slice(0, n) for n in npts)]
    return out


# ---------------------------------------------------------------------------
# 1D planking
# ---------------------------------------------------------------------------

_PLANK_W = 512


def _plank_1d(band_t, x_pad, b, n, p):
    """Re-layout a 1D stencil problem as an overlapping-row 2D one."""
    W = _PLANK_W
    R = _cdiv(n, W)
    n_pad = R * W
    if n_pad != n:
        band_t = jnp.pad(band_t, [(0, 0), (0, n_pad - n)])
        x_pad = jnp.pad(x_pad, [(0, n_pad - n)])
        if b is not None:
            b = jnp.pad(b, [(0, n_pad - n)])
    w = 2 * p + 1
    band2_t = band_t.reshape(w, R, W)
    # overlapping x rows: x2[r, c] = x_pad_flat[r*W + c], c in [0, W + 2p)
    idx = (jnp.arange(R) * W)[:, None] + jnp.arange(W + 2 * p)[None, :]
    x2 = x_pad[idx]          # (R, W + 2p): row r already includes halos
    b2 = b.reshape(R, W) if b is not None else None
    return band2_t, x2, b2, R, W, n_pad


def _unplank(out2, n):
    return out2.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def _dispatch(band_t, x_pad, b, omega, npts, pads, mode, interpret):
    nd = len(npts)
    if nd == 1:
        n, p = npts[0], pads[0]
        band2_t, x2, b2, R, W, n_pad = _plank_1d(band_t, x_pad, b, n, p)
        # lift planked 2D to 3D with pads (0, 0, p): halo along lanes only.
        # band gets unit win AND unit grid dims for the lifted axis.
        band6 = band2_t[None, None, :, None]    # (1, 1, w, 1, R, W)
        out = _stencil_call(band6, x2[None],
                            None if b2 is None else b2[None], omega,
                            (1, R, W), (0, 0, p), mode, interpret)
        return _unplank(out[0], n)
    if nd == 2:
        band6 = band_t[None, :, :, None]        # (1, w1, w2, 1, n1, n2)
        out = _stencil_call(band6, x_pad[None],
                            None if b is None else b[None], omega,
                            (1,) + tuple(npts), (0,) + tuple(pads),
                            mode, interpret)
        return out[0]
    if nd == 3:
        return _stencil_call(band_t, x_pad, b, omega, tuple(npts),
                             tuple(pads), mode, interpret)
    raise NotImplementedError("pallas kernels cover 1D/2D/3D")


def spmv_banded_pallas(band_t, x_pad, npts, pads, interpret=False):
    """out[i] = Σ_k band_t[k, i] · x_pad[i+k] — Pallas twin of
    :func:`poms_tpu.ops.spmv.spmv_banded_jnp` (bit-compatible in f32)."""
    return _dispatch(band_t, x_pad, None, None, tuple(npts), tuple(pads),
                     "spmv", interpret)


def residual_fused_pallas(band_t, x_pad, b, npts, pads, interpret=False):
    """r = b − A·x in one fused pass."""
    return _dispatch(band_t, x_pad, b, None, tuple(npts), tuple(pads),
                     "residual", interpret)


def jacobi_fused_pallas(band_t, x_pad, b, omega, npts, pads, interpret=False):
    """x' = x + ω·(b − A·x)/diag(A) in one fused pass (SURVEY.md §7.0)."""
    return _dispatch(band_t, x_pad, b, float(omega), tuple(npts),
                     tuple(pads), "jacobi", interpret)
