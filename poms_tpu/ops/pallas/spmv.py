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
from functools import partial as _partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spmv_banded_pallas", "jacobi_fused_pallas",
           "residual_fused_pallas", "rbgs_color_pallas", "pack_band_v2"]

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
    sublane tile sized so one (1, w2, w3) band chunk fits a ~4 MB VMEM
    budget (the pipeline double-buffers it → 8 MB, plus 2 halo windows and
    the output block, within the ~16 MB v5e VMEM); leading dim tiles at 1.

    t2 is then shrunk to the smallest tile that keeps the same tile COUNT
    over npts[1], so grid padding (pure wasted band traffic — zero rows are
    still streamed) is at most 7 rows instead of up to t2 − 1.  Bigger tiles
    mean fewer x-window DMAs (less x amplification) and fewer pipeline
    boundaries — measured round 2: (1, 128, 128) on 128³ p3 beats the
    round-1 (1, 64, 128) by ~8% SoL.
    """
    w2, w3 = 2 * pads[1] + 1, 2 * pads[2] + 1
    budget = 4 * 1024 * 1024
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

def _make_kernel(tile, pads, mode, win_al, kc, gshape):
    p1, p2, p3 = pads
    w2, w3 = 2 * p2 + 1, 2 * p3 + 1
    GI, GJ, GL = gshape
    n_tiles = GI * GJ * GL

    def window_copy(ids, xw, sem, slot, x_hbm):
        """Async HBM→VMEM copy of tile ``ids``'s halo window into buffer
        ``slot``.  Lane start stays a syntactic multiple of 128 (Mosaic
        provable-divisibility requirement — module docstring)."""
        src = x_hbm.at[pl.ds(jnp.int32(ids[0] * tile[0]), win_al[0]),
                       pl.ds(jnp.int32(ids[1] * tile[1]), win_al[1]),
                       pl.ds(jnp.int32(ids[2] * tile[2]), win_al[2])]
        return pltpu.make_async_copy(src, xw.at[slot], sem.at[slot])

    def body_common(k, x_hbm, band_ref, xw, sem):
        """One k1-chunk of shifted MACs.  The halo window is DOUBLE-
        BUFFERED: at k == 0 the kernel waits on the copy for THIS tile
        (issued one tile ago) and immediately starts the copy for the NEXT
        tile, which then overlaps all kc compute chunks — round 1's
        synchronous per-tile window DMA was a measured ~10% SoL stall."""
        # program_id must be bound OUTSIDE pl.when bodies: the interpret-
        # mode interpreter only substitutes it in the top-level jaxpr
        ids = [pl.program_id(a) for a in range(3)]
        # int32 throughout: under jax_enable_x64 the mixed
        # int32×PythonInt arithmetic promotes to i64, which
        # Mosaic's memref_slice rejects (round-4 finding)
        t_lin = jnp.int32((ids[0] * GJ + ids[1]) * GL + ids[2])
        slot = jax.lax.rem(t_lin, jnp.int32(2))

        @pl.when(k == 0)
        def _():
            @pl.when(t_lin == 0)
            def _():
                window_copy(ids, xw, sem, 0, x_hbm).start()

            window_copy(ids, xw, sem, slot, x_hbm).wait()
            nxt = t_lin + jnp.int32(1)

            @pl.when(nxt < n_tiles)
            def _():
                l2 = jax.lax.rem(nxt, jnp.int32(GL))
                j2 = jax.lax.rem(jax.lax.div(nxt, jnp.int32(GL)),
                             jnp.int32(GJ))
                i2 = jax.lax.div(nxt, jnp.int32(GJ * GL))
                window_copy((i2, j2, l2), xw, sem, jnp.int32(1) - slot,
                        x_hbm).start()

        # Round-2 measured lesson (bench/kernel_probe.py ablations): NO
        # staged intermediates.  Round 1 sliced a per-k3 ``xs`` view and
        # re-sliced it per k2 — Mosaic materialized every staged slice as a
        # VMEM copy, and those copies (not the DMA, not the MACs) were
        # ~70% of the kernel time (5.1 ms vs the 1.4 ms pure band-stream
        # floor at the same DMA pattern; removing loads/shifts/multiplies
        # from the staged form changed nothing).  Each term now reads its
        # shifted window DIRECTLY from the scratch ref so the read feeds
        # the MAC without a round trip, and per-k2 accumulators keep the
        # FP add chains short.
        accs = [None] * w2
        for k3 in range(w3):
            for k2 in range(w2):
                coeff = band_ref[0, k2, k3, 0]          # (t2, t3) contiguous
                shifted = xw[slot, pl.ds(k, 1), pl.ds(k2, tile[1]),
                             pl.ds(k3, tile[2])].reshape(tile[1], tile[2])
                term = coeff * shifted
                accs[k2] = term if accs[k2] is None else accs[k2] + term
        while len(accs) > 1:                            # pairwise tree
            accs = [accs[i] + accs[i + 1] if i + 1 < len(accs) else accs[i]
                    for i in range(0, len(accs), 2)]
        return accs[0].reshape(1, tile[1], tile[2]), slot, ids

    if mode in ("spmv", "residual"):
        def kernel(x_hbm, band_ref, *rest):
            if mode == "spmv":
                out_ref, xw, sem = rest
            else:
                b_ref, out_ref, xw, sem = rest
            k = pl.program_id(3)
            acc, _, _ = body_common(k, x_hbm, band_ref, xw, sem)

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

    if mode == "jacobi":
        # jacobi: needs diag + b + omega; finalize on the last chunk
        def kernel(omega_ref, x_hbm, band_ref, b_ref, diag_ref, *rest):
            out_ref, xw, sem = rest
            k = pl.program_id(3)
            acc, slot, _ = body_common(k, x_hbm, band_ref, xw, sem)

            @pl.when(k == 0)
            def _():
                out_ref[...] = acc

            @pl.when(k > 0)
            def _():
                out_ref[...] = out_ref[...] + acc

            @pl.when(k == kc - 1)
            def _():
                center = xw[slot, pl.ds(p1, 1), pl.ds(p2, tile[1]),
                            pl.ds(p3, tile[2])].reshape(1, tile[1], tile[2])
                omega = omega_ref[0]
                out_ref[...] = center + omega * (
                    b_ref[...] - out_ref[...]) / diag_ref[...]
        return kernel

    # rbgs one-color phase (SURVEY.md §7.1.5): fused full SpMV + masked
    # hybrid-GS update.  ``mode`` is ("rbgs", color, parity_coeffs) with
    # color ∈ {0, 1} static and parity_coeffs the per-(lifted-)dim parity
    # weights of the GLOBAL grid index (1D planking gives dim coefficients
    # (0, W%2, 1); true 2D/3D give all-ones on the real dims).  The dynamic
    # part of the parity base (distributed block offsets, traced under
    # shard_map) arrives as the scalar-prefetch ``pbase_ref``.
    #
    #   offdiag = A·x − diag·x
    #   x'[c]   = (1−ω)·x[c] + ω·(b − offdiag)[c]/diag   on color-c points
    _, color, pcoef = mode

    def kernel(omega_ref, pbase_ref, x_hbm, band_ref, b_ref, diag_ref,
               *rest):
        out_ref, xw, sem = rest
        k = pl.program_id(3)
        acc, slot, ids = body_common(k, x_hbm, band_ref, xw, sem)

        @pl.when(k == 0)
        def _():
            out_ref[...] = acc

        @pl.when(k > 0)
        def _():
            out_ref[...] = out_ref[...] + acc

        # tile-start parity contribution must be bound outside pl.when
        base = (pbase_ref[0]
                + pcoef[0] * ids[0] * tile[0]
                + pcoef[1] * ids[1] * tile[1]
                + pcoef[2] * ids[2] * tile[2])

        @pl.when(k == kc - 1)
        def _():
            center = xw[slot, pl.ds(p1, 1), pl.ds(p2, tile[1]),
                        pl.ds(p3, tile[2])].reshape(1, tile[1], tile[2])
            omega = omega_ref[0]
            diag = diag_ref[...]
            offdiag = out_ref[...] - diag * center
            gs = (b_ref[...] - offdiag) / diag
            upd = (1.0 - omega) * center + omega * gs
            lin = base
            if pcoef[1]:
                lin = lin + jax.lax.broadcasted_iota(
                    jnp.int32, (1, tile[1], tile[2]), 1)
            if pcoef[2]:
                lin = lin + jax.lax.broadcasted_iota(
                    jnp.int32, (1, tile[1], tile[2]), 2)
            mask = jax.lax.rem(lin, jnp.int32(2)) == color
            out_ref[...] = jnp.where(mask, upd, center)
    return kernel


def _x64_off(fn):
    """Trace the Pallas call with jax_enable_x64 OFF: Mosaic materializes
    index constants in the default integer width, and under x64 the i64s
    are rejected by tpu.memref_slice (or send convert lowering into
    infinite recursion).  All operands here are f32/bf16/i32, so x64-off
    tracing is semantics-preserving (round-4 finding; same guard in
    ops/pallas/kron.py)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.enable_x64(False):
            return fn(*args, **kwargs)
    return wrapper


@_x64_off
def _stencil_call(band_t, x_pad, b, omega, npts, pads, mode, interpret,
                  pbase=None):
    kind = mode[0] if isinstance(mode, tuple) else mode
    dtype = band_t.dtype
    itemsize = jnp.dtype(dtype).itemsize
    kc = 2 * pads[0] + 1
    w2, w3 = 2 * pads[1] + 1, 2 * pads[2] + 1
    tile = _choose_tiles(npts, pads, itemsize)
    band_t, x_pad, b, N, win_al = _pad_operands(band_t, x_pad, b, npts,
                                                pads, tile)
    diag = band_t[tuple(pads)] if kind in ("jacobi", "rbgs") else None
    grid = (N[0] // tile[0], N[1] // tile[1], N[2] // tile[2], kc)

    band_spec = pl.BlockSpec(
        (1, w2, w3, 1, tile[1], tile[2]),
        lambda i, j, l, k, *_: (k, 0, 0, i, j, l),
        memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, tile[1], tile[2]),
                            lambda i, j, l, k, *_: (i, j, l),
                            memory_space=pltpu.VMEM)
    # x stays in HBM: halo windows overlap between tiles, which BlockSpec
    # pipelining can't express; a manual (double-buffered) per-tile DMA can.
    x_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    scratch = [pltpu.VMEM((2,) + win_al, dtype),
               pltpu.SemaphoreType.DMA((2,))]
    out_shape = jax.ShapeDtypeStruct(N, dtype)
    kernel = _make_kernel(tile, pads, mode, win_al, kc, grid[:3])

    if kind == "spmv":
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=[x_spec, band_spec],
            out_specs=vec_spec, out_shape=out_shape,
            scratch_shapes=scratch, interpret=interpret,
        )(x_pad, band_t)
    elif kind == "residual":
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=[x_spec, band_spec, vec_spec],
            out_specs=vec_spec, out_shape=out_shape,
            scratch_shapes=scratch, interpret=interpret,
        )(x_pad, band_t, b)
    elif kind == "jacobi":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[x_spec, band_spec, vec_spec, vec_spec],
            out_specs=vec_spec, scratch_shapes=scratch)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(jnp.asarray([omega], dtype), x_pad, band_t, b, diag)
    else:  # rbgs color phase
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=grid,
            in_specs=[x_spec, band_spec, vec_spec, vec_spec],
            out_specs=vec_spec, scratch_shapes=scratch)
        pbase_arr = jnp.asarray(pbase, jnp.int32).reshape(1)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(jnp.asarray([omega], dtype), pbase_arr, x_pad, band_t, b, diag)
    if N != tuple(npts):
        out = out[tuple(slice(0, n) for n in npts)]
    return out


# ---------------------------------------------------------------------------
# v2 engine: DMA-delivered sublane shifts + t0-plane reuse
# ---------------------------------------------------------------------------
#
# Round-2/3 ablations (bench/kernel_probe.py) localize v1's cap in the VPU:
# every (k1,k2,k3) term materializes a fresh shifted window read (~7
# vreg-ops/nnz; the sublane funnel is the worst part).  v2 removes both
# shift axes from the per-term path:
#
#   - the SUBLANE (dim-1) shift is done by the DMA engine: the halo window
#     is copied w2 times per tile, once per k2 offset (HBM sublane slice
#     starts are unconstrained; only lane starts must be 128-aligned), so
#     the kernel holds xw[slot, k2] = x[.., j+k2, ..] pre-shifted.  Extra
#     HBM x traffic: w2·nq/(w1·w2·w3·t0) ≈ 7% of band traffic at t0=8.
#   - the LEADING (dim-0) shift is free: a plane index into the window.
#     Tiling the output leading dim at t0 planes makes each copied window
#     serve w1 output planes, which is what amortizes the extra copies.
#   - only the LANE (dim-2) shift remains on the VPU, as a static-offset
#     VMEM read (one aligned load + one rotate), fused into the MAC.
#
# Inner loop is i1-outer so each output plane's accumulator stays in
# registers across its (2p+1)² terms per chunk — accs never round-trip
# VMEM (v15's cache-array variant lost exactly there: measured 57% SoL vs
# v1's 68%, the cache fill + reload traffic ate the shift savings).


# Depth of the manual band-slab prefetch queue (v2): slab for step s+D is
# issued at the end of step s, so each 3.2 MB fetch gets ~D steps of chunk
# compute (~4.6 µs each at 128³ p3) to complete off the critical path.
# Round 3 measured the Pallas BlockSpec auto-pipeline leaving ~1.5 ms of
# band DMA unhidden at these shapes (BASELINE.md round-3 ladder); the
# manual queue is the fix (VERDICT.md round-3 ask #1).
_BAND_DEPTH = 3


def _choose_tiles_v2(npts, pads, itemsize):
    """(t0, t2, 128): leading dim tiled at 8 planes (plane reuse), lane
    pinned to one native tile, t2 sized to a ~14 MB VMEM budget counting
    the D-deep manual band-slab queue, the w2 double-buffered halo windows
    and the output/vector blocks; then shrunk to the smallest tile keeping
    the same tile count (grid padding is wasted band stream)."""
    w2, w3 = 2 * pads[1] + 1, 2 * pads[2] + 1
    t3 = _LANE
    t0 = 8 if npts[0] >= 8 else 1
    nq = t0 + 2 * pads[0]
    t3w = _rup(t3 + 2 * pads[2], _LANE)
    budget = 14 * 1024 * 1024
    per_t2 = itemsize * (_BAND_DEPTH * w2 * w3 * t0 * t3
                         + 2 * w2 * nq * t3w + 4 * t0 * t3)
    t2 = budget // per_t2
    t2 = max(_SUB, min((t2 // _SUB) * _SUB, 256))
    n_tiles = _cdiv(npts[1], t2)
    t2 = _rup(_cdiv(npts[1], n_tiles), _SUB)
    return (t0, t2, t3)


def _window_v2(tile, pads):
    """Per-k2 halo window (nq, t2, t3w): leading = t0 + 2p0 planes, sublane
    = exactly t2 rows (the k2 shift moved into the DMA source offset), lane
    = t3 + 2p2 rounded up to a native tile."""
    nq = tile[0] + 2 * pads[0]
    t3w = _rup(tile[2] + 2 * pads[2], _LANE)
    return (nq, tile[1], t3w)


def _pad_operands_v2(band_t, x_pad, b, npts, pads, tile):
    """Zero-pad grid dims to tile multiples; x additionally gets lane-dim
    end padding so the alignment-rounded window DMA stays in bounds (the
    other dims' windows end exactly at N + 2p — no rounding there)."""
    nd = 3
    N = tuple(_rup(npts[a], tile[a]) for a in range(nd))
    t3w = _rup(tile[2] + 2 * pads[2], _LANE)
    lane_extra = t3w - (tile[2] + 2 * pads[2])
    if N != tuple(npts):
        if band_t is not None:       # None: band handled by pack_band_v2
            band_t = jnp.pad(band_t, [(0, 0)] * nd
                             + [(0, N[a] - npts[a]) for a in range(nd)])
        if b is not None:
            b = jnp.pad(b, [(0, N[a] - npts[a]) for a in range(nd)])
    x_extra = [(0, N[a] - npts[a] + (lane_extra if a == 2 else 0))
               for a in range(nd)]
    if any(e != (0, 0) for e in x_extra):
        x_pad = jnp.pad(x_pad, x_extra)
    return band_t, x_pad, b, N


def _make_kernel_v2(tile, pads, mode, win, kc, gshape):
    p0, p1, p2 = pads
    t0, t2, t3 = tile
    w2, w3 = 2 * p1 + 1, 2 * p2 + 1
    GI, GJ, GL = gshape
    n_tiles = GI * GJ * GL

    def window_copy(ids, k2, xw, sem, slot, x_hbm):
        """Async copy of the k2-sublane-shifted halo window.  The shift
        lives in the PRE-SHIFTED HBM stack xs[k2] (built by XLA in
        _stencil_call_v2): Mosaic requires DMA slice starts to be provably
        divisible by the (8, 128) tiling in BOTH tiled dims — measured
        this round: `ids[1]*t2 + k2` fails to prove for dim 1 — so the
        kernel-side starts are all syntactic tile multiples and the +k2
        happened at stack-build time."""
        src = x_hbm.at[k2,
                       pl.ds(jnp.int32(ids[0] * t0), win[0]),
                       pl.ds(jnp.int32(ids[1] * t2), win[1]),
                       pl.ds(jnp.int32(ids[2] * t3), win[2])]
        return pltpu.make_async_copy(src, xw.at[slot, k2], sem.at[slot, k2])

    D = _BAND_DEPTH
    n_steps = n_tiles * kc

    def band_copy(s, bw, bsem, band_hbm, frac=1):
        """Async copy of step ``s``'s contiguous (S, t3) band slab from the
        pre-blocked HBM band into queue slot ``s % D``.  The slab dims are
        the tiled (sublane, lane) dims and always start at 0; the dynamic
        indices land on the untiled leading dims — no divisibility proof
        needed (contrast window_copy's sublane-start constraint).
        ``frac`` > 1 copies only the leading S/frac rows (timing-only
        'halfdma' ablation: keeps wait/issue counts and compute identical
        while cutting band HBM traffic)."""
        kq = jax.lax.rem(s, jnp.int32(kc))
        tq = jax.lax.div(s, jnp.int32(kc))
        slot = jax.lax.rem(s, jnp.int32(D))
        S = bw.shape[1]
        if frac > 1:
            return pltpu.make_async_copy(
                band_hbm.at[kq, tq, pl.ds(0, S // frac)],
                bw.at[slot, pl.ds(0, S // frac)], bsem.at[slot])
        return pltpu.make_async_copy(band_hbm.at[kq, tq], bw.at[slot],
                                     bsem.at[slot])

    def body_common(k, x_hbm, band_hbm, xw, sem, bw, bsem, out_ref):
        """One k1 chunk: per output plane i1, accumulate the (2p+1)² MACs
        against pre-shifted windows.  The halo windows are double-buffered
        across tiles exactly like v1 (wait this tile's w2 copies,
        immediately start the next tile's); the band slab rides a D-deep
        MANUAL prefetch queue over grid steps — the BlockSpec auto-pipeline
        left ~1.5 ms of band DMA unhidden at 128³ p3 (round-3 ladder), so
        the band never touches the auto-pipeline."""
        ids = [pl.program_id(a) for a in range(3)]
        # int32 throughout: under jax_enable_x64 the mixed
        # int32×PythonInt arithmetic promotes to i64, which
        # Mosaic's memref_slice rejects (round-4 finding)
        t_lin = jnp.int32((ids[0] * GJ + ids[1]) * GL + ids[2])
        slot = jax.lax.rem(t_lin, jnp.int32(2))
        s = jnp.int32(t_lin * kc + k)

        # timing-only ablations (results intentionally WRONG): "nolane"
        # pins the lane offset, "staticq" the window plane index,
        # "bandreuse" pins the band to step 0's slab (~zero band HBM
        # traffic) — they isolate operand-read / band-DMA cost components
        import os

        _abl = os.environ.get("POMS_V2_ABLATE", "")
        _reuse = "bandreuse" in _abl
        _frac = 2 if "halfdma" in _abl else 1

        @pl.when(s == 0)
        def _():
            for d in range(1 if _reuse else min(D, n_steps)):
                band_copy(jnp.int32(d), bw, bsem, band_hbm,
                          frac=_frac).start()

        @pl.when(k == 0)
        def _():
            @pl.when(t_lin == 0)
            def _():
                for k2 in range(w2):
                    window_copy(ids, k2, xw, sem, 0, x_hbm).start()

            for k2 in range(w2):
                window_copy(ids, k2, xw, sem, slot, x_hbm).wait()
            nxt = t_lin + jnp.int32(1)

            @pl.when(nxt < n_tiles)
            def _():
                l2 = jax.lax.rem(nxt, jnp.int32(GL))
                j2 = jax.lax.rem(jax.lax.div(nxt, jnp.int32(GL)),
                             jnp.int32(GJ))
                i2 = jax.lax.div(nxt, jnp.int32(GJ * GL))
                for k2 in range(w2):
                    window_copy((i2, j2, l2), k2, xw, sem,
                                jnp.int32(1) - slot, x_hbm).start()

        if _reuse:
            @pl.when(s == 0)
            def _():
                band_copy(jnp.int32(0), bw, bsem, band_hbm).wait()
            slot_b = jnp.int32(0)
        else:
            band_copy(s, bw, bsem, band_hbm, frac=_frac).wait()
            slot_b = jax.lax.rem(s, jnp.int32(D))

        for i1 in range(t0):
            # one live accumulator at a time; each output plane is folded
            # into out_ref the moment its (2p+1)² terms are summed (t0
            # simultaneously-live accumulators would spill the register
            # file across the whole chunk)
            acc = None
            for k2 in range(w2):
                q = i1 if "staticq" in _abl else k + i1
                for k3 in range(w3):
                    # blocked band (see _stencil_call_v2): each grid step's
                    # slab is contiguous in HBM and every coeff read is a
                    # static aligned (t2, t3) slice.  Round-4 measured
                    # A/B: hoisting one wide (t2, t3w) window read per
                    # (k2, q) and slicing it in-register is SLOWER
                    # (5.60 ms vs 5.47 ms at 128³ p3) — the per-term ref
                    # read with static lane offset is the faster form.
                    off = ((k2 * w3 + k3) * t0 + i1) * t2
                    coeff = bw[slot_b, pl.ds(off, t2), :]
                    k3e = 0 if "nolane" in _abl else k3
                    opnd = xw[slot, k2, q, :,
                              pl.ds(k3e, t3)]              # lane rotate
                    term = coeff * opnd
                    acc = term if acc is None else acc + term

            @pl.when(k == 0)
            def _(i1=i1, acc=acc):
                out_ref[i1] = acc

            @pl.when(k > 0)
            def _(i1=i1, acc=acc):
                out_ref[i1] = out_ref[i1] + acc

        # issue step s+D's slab AFTER the compute loop: slot s % D has just
        # been fully read, so the overwrite is safe, and the fetch gets D
        # steps of compute to hide under
        if not _reuse:
            @pl.when(s + D < n_steps)
            def _():
                band_copy(s + jnp.int32(D), bw, bsem, band_hbm,
                          frac=_frac).start()
        return slot

    def center_plane(xw, slot, i1):
        """Unshifted central operand for output plane i1: window k2 = p1,
        plane index i1 + p0, lane offset p2 — all static."""
        return xw[slot, p1, i1 + p0, :, pl.ds(p2, t3)]

    if mode in ("spmv", "residual"):
        def kernel(x_hbm, band_hbm, *rest):
            if mode == "spmv":
                out_ref, xw, sem, bw, bsem = rest
            else:
                b_ref, out_ref, xw, sem, bw, bsem = rest
            k = pl.program_id(3)
            body_common(k, x_hbm, band_hbm, xw, sem, bw, bsem, out_ref)

            if mode == "residual":
                @pl.when(k == kc - 1)
                def _():
                    out_ref[...] = b_ref[...] - out_ref[...]
        return kernel

    if mode == "jacobi":
        def kernel(omega_ref, x_hbm, band_hbm, b_ref, diag_ref, *rest):
            out_ref, xw, sem, bw, bsem = rest
            k = pl.program_id(3)
            slot = body_common(k, x_hbm, band_hbm, xw, sem, bw, bsem,
                               out_ref)

            @pl.when(k == kc - 1)
            def _():
                omega = omega_ref[0]
                for i1 in range(t0):
                    center = center_plane(xw, slot, i1)
                    out_ref[i1] = center + omega * (
                        b_ref[i1] - out_ref[i1]) / diag_ref[i1]
        return kernel

    # rbgs color phase — same parity convention as v1 (module docstring)
    _, color, pcoef = mode

    def kernel(omega_ref, pbase_ref, x_hbm, band_hbm, b_ref, diag_ref,
               *rest):
        out_ref, xw, sem, bw, bsem = rest
        k = pl.program_id(3)
        ids = [pl.program_id(a) for a in range(3)]
        slot = body_common(k, x_hbm, band_hbm, xw, sem, bw, bsem, out_ref)

        base = (pbase_ref[0]
                + pcoef[0] * ids[0] * t0
                + pcoef[1] * ids[1] * t2
                + pcoef[2] * ids[2] * t3)

        @pl.when(k == kc - 1)
        def _():
            omega = omega_ref[0]
            for i1 in range(t0):
                center = center_plane(xw, slot, i1)
                diag = diag_ref[i1]
                offdiag = out_ref[i1] - diag * center
                gs = (b_ref[i1] - offdiag) / diag
                upd = (1.0 - omega) * center + omega * gs
                lin = base + pcoef[0] * i1
                if pcoef[1]:
                    lin = lin + jax.lax.broadcasted_iota(
                        jnp.int32, (t2, t3), 0)
                if pcoef[2]:
                    lin = lin + jax.lax.broadcasted_iota(
                        jnp.int32, (t2, t3), 1)
                mask = jax.lax.rem(lin, jnp.int32(2)) == color
                out_ref[i1] = jnp.where(mask, upd, center)
    return kernel


def pack_band_v2(band_t, npts, pads):
    """Pre-block a band for the v2 engine (one contiguous HBM slab per
    grid step — see the blocked-band comment in _stencil_call_v2).

    The relayout moves the full band once (~band-size read+write), so it
    MUST happen once per operator, not per apply: measured on v5e, XLA
    does NOT hoist it out of a chained-iteration loop (14.3 ms/iter vs
    5.7 ms with the relayout inlined vs hoisted).  Production callers
    (StencilMatrix, the bench, smoother sweeps) pack at setup and pass the
    result through ``packed=``.
    """
    npts, pads = tuple(npts), tuple(pads)
    itemsize = jnp.dtype(band_t.dtype).itemsize
    tile = _choose_tiles_v2(npts, pads, itemsize)
    N = tuple(_rup(npts[a], tile[a]) for a in range(3))
    blk, diag = _pack_arrays_v2(band_t, npts, pads, tile)
    return {"blk": blk, "diag": diag, "tile": tile, "N": N,
            "npts": npts, "pads": pads}


@_partial(jax.jit, static_argnames=("npts", "pads", "tile"))
def _pack_arrays_v2(band_t, npts, pads, tile):
    """One fused XLA program for the relayout (a single tunnel compile,
    persistent-cacheable; eager per-op execution stalls the remote
    compiler on this machine)."""
    kc = 2 * pads[0] + 1
    w2, w3 = 2 * pads[1] + 1, 2 * pads[2] + 1
    t0, t2, t3 = tile
    N = tuple(_rup(npts[a], tile[a]) for a in range(3))
    if N != npts:
        band_t = jnp.pad(band_t, [(0, 0)] * 3
                         + [(0, N[a] - npts[a]) for a in range(3)])
    diag = band_t[tuple(pads)]
    GI, GJ, GL = (N[0] // t0, N[1] // t2, N[2] // t3)
    S = w2 * w3 * t0 * t2
    blk = band_t.reshape(kc, w2, w3, GI, t0, GJ, t2, GL, t3)
    blk = blk.transpose(0, 3, 5, 7, 1, 2, 4, 6, 8)
    blk = blk.reshape(kc, GI * GJ * GL, S, t3)
    return blk, diag


@_x64_off
def _stencil_call_v2(band_t, x_pad, b, omega, npts, pads, mode, interpret,
                     pbase=None, packed=None):
    kind = mode[0] if isinstance(mode, tuple) else mode
    dtype = (band_t if packed is None else packed["blk"]).dtype
    itemsize = jnp.dtype(dtype).itemsize
    kc = 2 * pads[0] + 1
    w2, w3 = 2 * pads[1] + 1, 2 * pads[2] + 1
    if packed is None:
        packed = pack_band_v2(band_t, npts, pads)
    elif (packed["npts"] != tuple(npts) or packed["pads"] != tuple(pads)):
        # hard error (not assert: stripped under -O, and a mismatched pack
        # silently produces garbage output)
        raise ValueError(
            f"packed band was built for npts={packed['npts']} "
            f"pads={packed['pads']}, called with npts={tuple(npts)} "
            f"pads={tuple(pads)}")
    tile = packed["tile"]
    _, x_pad, b, N = _pad_operands_v2(None, x_pad, b, npts, pads, tile)
    if N != packed["N"]:
        raise ValueError(f"packed band N={packed['N']} != computed N={N}")
    win = _window_v2(tile, pads)
    # Pre-shifted HBM stack: xs[k2, i, j, l] = x_pad[i, j + k2, l].  One
    # cheap XLA pass (~5% of band traffic at 128³ p3) that moves the
    # sublane stencil shift off the VPU *and* out of the DMA start
    # arithmetic (kernel-side starts must be provable tile multiples —
    # see window_copy).
    xs = jnp.stack([jax.lax.slice_in_dim(x_pad, k2, k2 + N[1], axis=1)
                    for k2 in range(w2)])
    diag = packed["diag"] if kind in ("jacobi", "rbgs") else None
    grid = (N[0] // tile[0], N[1] // tile[1], N[2] // tile[2], kc)
    GI, GJ, GL = grid[:3]
    t0, t2, t3 = tile
    S = w2 * w3 * t0 * t2
    band_blk = packed["blk"]

    import os as _os

    if _os.environ.get("POMS_V2_ABLATE", ""):
        # ablation flags intentionally produce WRONG results; a stale env
        # var in a long-lived process would silently corrupt production v2
        # output, so be loud about it (ADVICE r3)
        import warnings

        warnings.warn(
            "POMS_V2_ABLATE is set — v2 Pallas results are intentionally "
            "WRONG (timing-only ablation mode)", stacklevel=2)
    # band stays whole-array in HBM: the kernel DMAs each grid step's
    # contiguous (S, t3) slab through a _BAND_DEPTH-deep manual prefetch
    # queue (see _make_kernel_v2.band_copy) — the BlockSpec auto-pipeline
    # measurably failed to hide the 3.2 MB/step fetch (round-3 ladder)
    band_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    vec_spec = pl.BlockSpec(tile,
                            lambda i, j, l, k, *_: (i, j, l),
                            memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    scratch = [pltpu.VMEM((2, w2) + win, dtype),
               pltpu.SemaphoreType.DMA((2, w2)),
               pltpu.VMEM((_BAND_DEPTH, S, t3), dtype),
               pltpu.SemaphoreType.DMA((_BAND_DEPTH,))]
    out_shape = jax.ShapeDtypeStruct(N, dtype)
    kernel = _make_kernel_v2(tile, pads, mode, win, kc, grid[:3])
    # all dims 'arbitrary': the manual double-buffered window DMA and the
    # band prefetch queue both assume the sequential t_lin/step order, so
    # no dim may be declared 'parallel'
    cparams = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary", "arbitrary",
                             "arbitrary"))

    if kind == "spmv":
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=[x_spec, band_spec],
            out_specs=vec_spec, out_shape=out_shape,
            scratch_shapes=scratch, interpret=interpret,
            compiler_params=cparams,
        )(xs, band_blk)
    elif kind == "residual":
        out = pl.pallas_call(
            kernel, grid=grid, in_specs=[x_spec, band_spec, vec_spec],
            out_specs=vec_spec, out_shape=out_shape,
            scratch_shapes=scratch, interpret=interpret,
            compiler_params=cparams,
        )(xs, band_blk, b)
    elif kind == "jacobi":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[x_spec, band_spec, vec_spec, vec_spec],
            out_specs=vec_spec, scratch_shapes=scratch)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret, compiler_params=cparams,
        )(jnp.asarray([omega], dtype), xs, band_blk, b, diag)
    else:  # rbgs color phase
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=grid,
            in_specs=[x_spec, band_spec, vec_spec, vec_spec],
            out_specs=vec_spec, scratch_shapes=scratch)
        pbase_arr = jnp.asarray(pbase, jnp.int32).reshape(1)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret, compiler_params=cparams,
        )(jnp.asarray([omega], dtype), pbase_arr, xs, band_blk, b, diag)
    if N != tuple(npts):
        out = out[tuple(slice(0, n) for n in npts)]
    return out


# ---------------------------------------------------------------------------
# 1D planking
# ---------------------------------------------------------------------------

import os as _os

_PLANK_W = int(_os.environ.get("POMS_TPU_PLANK_W", "512"))


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
    # overlapping x rows: x2[r, c] = x_pad_flat[r*W + c], c in [0, W + 2p).
    # Built from reshapes + one concat (a fancy-index gather here measured
    # ~7 ns/element on TPU — it was the whole 1D wall time in round 4):
    #   columns [0, W)       = x_pad[:R·W] reshaped
    #   columns [W, W + 2p)  = x_pad[W:] (row-shifted view) reshaped
    core = x_pad[:R * W].reshape(R, W)
    tail_flat = x_pad[W:]
    tail = jnp.pad(tail_flat, (0, R * W - tail_flat.shape[0]))
    x2 = jnp.concatenate([core, tail.reshape(R, W)[:, :2 * p]], axis=1)
    b2 = b.reshape(R, W) if b is not None else None
    return band2_t, x2, b2, R, W, n_pad


def _unplank(out2, n):
    return out2.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def _engine():
    """Kernel engine selection.

    Round-4 numbers (K/2K-differenced timing — the pre-round-4 figures
    that used to live here were artifacts of ~24 ms of tunnel dispatch
    smeared into every measurement and are formally retracted in
    BASELINE.md "round-4 retraction"):

    - ``v1`` (default): the chunked kernel — 3.82 ms = 92.5% of the
      819 GB/s paper SoL on 128³ p3 f32, statistically identical to the
      same-session plain-XLA stream ceiling (3.818 ms).  HBM-bound; the
      ≥80%-SoL bar (BASELINE.json:5) is met by this engine.
    - ``v2`` (``POMS_TPU_SPMV=v2``): manual depth-3 band-prefetch queue —
      4.30 ms = 82.1% SoL; kept as the documented manual-DMA variant.
      Callers MUST pass ``packed=pack_band_v2(...)`` from loops — the
      inline relayout fallback re-runs the full band transpose per
      application (measured 14.3 ms/iter; XLA does not hoist
      loop-invariant relayouts out of fori_loop).
    """
    import os

    return (_stencil_call_v2 if os.environ.get("POMS_TPU_SPMV") == "v2"
            else _stencil_call)


def _dispatch(band_t, x_pad, b, omega, npts, pads, mode, interpret,
              color=None, starts=None, packed=None):
    nd = len(npts)
    call = _engine()
    if packed is not None and (nd != 3 or call is not _stencil_call_v2):
        packed = None        # pre-packing only exists for the 3D v2 path
    if starts is None:
        starts = (0,) * nd
    if nd == 1:
        n, p = npts[0], pads[0]
        band2_t, x2, b2, R, W, n_pad = _plank_1d(band_t, x_pad, b, n, p)
        # lift planked 2D to 3D with pads (0, 0, p): halo along lanes only.
        # band gets unit win AND unit grid dims for the lifted axis.
        # Parity of the flat global index r·W + c + start: W is even, so the
        # per-dim parity coefficients are (0, 0, 1) and the base is start.
        if isinstance(mode, str) and mode == "rbgs":
            mode = ("rbgs", color, (0, W % 2, 1))
        band6 = band2_t[None, None, :, None]    # (1, 1, w, 1, R, W)
        out = call(band6, x2[None],
                            None if b2 is None else b2[None], omega,
                            (1, R, W), (0, 0, p), mode, interpret,
                            pbase=starts[0])
        return _unplank(out[0], n)
    if nd == 2:
        if isinstance(mode, str) and mode == "rbgs":
            mode = ("rbgs", color, (0, 1, 1))
        band6 = band_t[None, :, :, None]        # (1, w1, w2, 1, n1, n2)
        out = call(band6, x_pad[None],
                            None if b is None else b[None], omega,
                            (1,) + tuple(npts), (0,) + tuple(pads),
                            mode, interpret, pbase=starts[0] + starts[1])
        return out[0]
    if nd == 3:
        if isinstance(mode, str) and mode == "rbgs":
            mode = ("rbgs", color, (1, 1, 1))
        kw = {"packed": packed} if packed is not None else {}
        return call(band_t, x_pad, b, omega, tuple(npts),
                             tuple(pads), mode, interpret,
                             pbase=starts[0] + starts[1] + starts[2], **kw)
    raise NotImplementedError("pallas kernels cover 1D/2D/3D")


def spmv_banded_pallas(band_t, x_pad, npts, pads, interpret=False,
                       packed=None):
    """out[i] = Σ_k band_t[k, i] · x_pad[i+k] — Pallas twin of
    :func:`poms_tpu.ops.spmv.spmv_banded_jnp` (bit-compatible in f32).

    ``packed``: optional :func:`pack_band_v2` result for the 3D v2 engine —
    pass it from any loop so the one-time band relayout is not re-traced
    per application."""
    return _dispatch(band_t, x_pad, None, None, tuple(npts), tuple(pads),
                     "spmv", interpret, packed=packed)


def residual_fused_pallas(band_t, x_pad, b, npts, pads, interpret=False,
                          packed=None):
    """r = b − A·x in one fused pass."""
    return _dispatch(band_t, x_pad, b, None, tuple(npts), tuple(pads),
                     "residual", interpret, packed=packed)


def jacobi_fused_pallas(band_t, x_pad, b, omega, npts, pads,
                        interpret=False, packed=None):
    """x' = x + ω·(b − A·x)/diag(A) in one fused pass (SURVEY.md §7.0)."""
    return _dispatch(band_t, x_pad, b, float(omega), tuple(npts),
                     tuple(pads), "jacobi", interpret, packed=packed)


def rbgs_color_pallas(band_t, x_pad, b, omega, color, npts, pads,
                      starts=None, interpret=False, packed=None):
    """One red-black Gauss–Seidel COLOR PHASE in a single fused pass
    (SURVEY.md §7.1.5): full banded SpMV + masked hybrid-GS update,

        x'[i] = (1−ω)·x[i] + ω·(b − (A·x)_offdiag)[i]/diag   if parity(i)==color
                x[i]                                          otherwise

    where parity is over the GLOBAL index sum (``starts``: per-dim global
    block offsets, traced under shard_map — mg/smoother.py::color_mask's
    convention).  Replaces round 1's full jnp off-diagonal SpMV per color
    (VERDICT.md missing #3): same band traffic, kernel-rate compute, and
    the mask/update fused so the vector never round-trips HBM.
    """
    return _dispatch(band_t, x_pad, b, float(omega), tuple(npts),
                     tuple(pads), "rbgs", interpret, color=int(color),
                     starts=starts, packed=packed)
