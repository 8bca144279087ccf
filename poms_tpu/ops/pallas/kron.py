"""Fused Pallas kernel for the 3D Kronecker-sum operator apply.

The XLA path (core/kron.py::_apply_interior) materializes every axis
partial in HBM: for 3D Poisson that is ~5 grid-sized intermediates
round-tripping HBM per apply (measured 0.70 ms at 128³ — already 10× the
banded-storage roofline, but ~3× above its own traffic floor).  This
kernel keeps the whole contraction chain in VMEM: per output tile it DMAs
one halo window of x, contracts axis 2 (lanes), axis 1 (sublanes) and
axis 0 (planes) through scratch buffers, and writes the summed terms
once — x is read ~1.2× and y written once, nothing else touches HBM.

Correctness mirrors apply_band_1d_axis term-for-term WITHOUT the shared
partial products (each term contracts independently; the extra VMEM
compute is cheaper than the bookkeeping).  Padding follows the banded
kernels: grid dims rounded up to tiles with ZERO band rows (zero rows →
zero output, sliced off), x ghost-padded by the caller's boundary rule
(Dirichlet zeros / periodic wrap) exactly as the XLA path does.

Layout notes (v5e Mosaic rules, see ops/pallas/spmv.py):
- lane tile pinned to 128; window lane extent rounded to 256 so the HBM
  window DMA start/extent stay provably aligned; in-kernel shifted reads
  are static lane rotates (measured free).
- per-axis coefficient layouts: axis-2 bands as (R, w2, N2) lane vectors,
  axis-1 as (R, w1, N1) read as (t1, 1) sublane columns, axis-0 as
  (R, w0, N0) scalars (one per unrolled output plane).

3D / f32 / npts[2] ≥ ~96 only — other cases stay on the XLA path (which
XLA fuses well at those sizes; see ops/dispatch.py round-4 measurements).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["kron_apply_pallas", "kron_pallas_supported"]

_LANE = 128
_SUB = 8


def _cdiv(a, b):
    return -(-a // b)


def _rup(a, b):
    return _cdiv(a, b) * b


def kron_pallas_supported(npts, pads, dtype) -> bool:
    """Static usability check for :func:`kron_apply_pallas`.

    Gated on the backend like dispatch.use_pallas: without it,
    POMS_TPU_KRON=pallas on a CPU/GPU host would hard-fail every
    KroneckerSumOperator apply at Mosaic lowering instead of degrading
    to the XLA path (ADVICE r4).
    """
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    return (on_tpu and len(npts) == 3 and jnp.dtype(dtype) == jnp.float32
            and npts[2] >= 96 and npts[0] >= 2)


def _choose_tiles(npts, pads):
    t2 = _LANE
    t0 = 8 if npts[0] >= 8 else _rup(npts[0], 2)
    # t1: one native-sublane multiple keeping window + u + v + out + the
    # compiler's spill stack for the unrolled contraction chain inside the
    # 16 MB VMEM budget (t1=128 measured 18.8 MB scoped — OOM; 64 fits)
    t1 = min(64, _rup(npts[1], _SUB))
    return (t0, t1, t2)


def _make_kernel(tile, pads, win, R, gshape):
    p0, p1, p2 = pads
    t0, t1, t2 = tile
    w0, w1, w2 = 2 * p0 + 1, 2 * p1 + 1, 2 * p2 + 1
    nq = t0 + 2 * p0
    GI, GJ, GL = gshape
    n_tiles = GI * GJ * GL

    def window_copy(ids, xw, sem, slot, x_hbm):
        src = x_hbm.at[pl.ds(jnp.int32(ids[0] * t0), win[0]),
                       pl.ds(jnp.int32(ids[1] * t1), win[1]),
                       pl.ds(jnp.int32(ids[2] * t2), win[2])]
        return pltpu.make_async_copy(src, xw.at[slot], sem.at[slot])

    def kernel(x_hbm, b0_ref, b1_ref, b2_ref, out_ref, xw, sem, u_ref,
               v_ref):
        ids = [pl.program_id(a) for a in range(3)]
        # int32 throughout: under jax_enable_x64 the mixed
        # int32×PythonInt arithmetic promotes to i64, which
        # Mosaic's memref_slice rejects (round-4 finding)
        t_lin = jnp.int32((ids[0] * GJ + ids[1]) * GL + ids[2])
        slot = jax.lax.rem(t_lin, jnp.int32(2))

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

        for r in range(R):
            # axis 2 (lanes): u[q, j, l] = Σ_t B2[r,t,l] · xw[q, j, l+t]
            for q in range(nq):
                acc = None
                for t in range(w2):
                    coeff = b2_ref[r, t, :].reshape(1, t2)
                    opnd = xw[slot, q, pl.ds(0, t1 + 2 * p1),
                              pl.ds(t, t2)]
                    term = coeff * opnd
                    acc = term if acc is None else acc + term
                # u scratch is sublane-rounded; write the live rows only
                u_ref[q, pl.ds(0, t1 + 2 * p1), :] = acc
            # axis 1 (sublanes): v[q, j, l] = Σ_t B1[r,j,t] · u[q, j+t, l]
            # (B1 ships as (R, N1, w1) so its block's last two dims satisfy
            # the Mosaic tiling rule at any t1, and the column read is
            # already sublane-oriented)
            for q in range(nq):
                acc = None
                for t in range(w1):
                    coeff = b1_ref[r, :, t].reshape(t1, 1)
                    opnd = u_ref[q, pl.ds(t, t1), :]
                    term = coeff * opnd
                    acc = term if acc is None else acc + term
                v_ref[q] = acc
            # axis 0 (planes): y[i] += Σ_t B0[r,t,i] · v[i+t] — B0 lives
            # whole-array in SMEM (scalars; a (R,w0,t0) VMEM block would
            # violate the last-dim tiling rule), indexed by the dynamic
            # global plane row i0·t0 + i
            for i in range(t0):
                acc = None
                for t in range(w0):
                    coeff = b0_ref[r, t, jnp.int32(ids[0] * t0 + i)]
                    term = coeff * v_ref[i + t]
                    acc = term if acc is None else acc + term
                if r == 0:
                    out_ref[i] = acc
                else:
                    out_ref[i] = out_ref[i] + acc

    return kernel


def kron_apply_pallas(terms, x_int, npts, pads, periodic,
                      interpret: bool = False):
    """y = (Σ_r ⊗_a B_r^(a)) x — fused Pallas twin of
    KroneckerSumOperator._apply_interior (bit-compatible per-term
    contraction order; terms summed in order).

    ``terms``: tuple of 3-tuples of (n_a, 2p_a+1) band arrays.
    """
    npts, pads = tuple(npts), tuple(pads)
    dtype = x_int.dtype
    R = len(terms)
    tile = _choose_tiles(npts, pads)
    t0, t1, t2 = tile
    N = tuple(_rup(npts[a], tile[a]) for a in range(3))
    p0, p1, p2 = pads
    w0, w1, w2 = 2 * p0 + 1, 2 * p1 + 1, 2 * p2 + 1

    # ghost-pad x by the boundary rule, then zero-extend to the rounded
    # grid + window alignment slack (padded outputs are sliced off)
    x_pad = jnp.pad(x_int, [(p, p) for p in pads],
                    mode="wrap" if any(periodic) else "constant") \
        if all(periodic) or not any(periodic) else _pad_mixed(
            x_int, pads, periodic)
    win = (t0 + 2 * p0, _rup(t1 + 2 * p1, _SUB), _rup(t2 + 2 * p2, _LANE))
    extra = [N[a] - npts[a] for a in range(3)]
    extra[1] += win[1] - (t1 + 2 * p1)
    extra[2] += win[2] - (t2 + 2 * p2)
    x_pad = jnp.pad(x_pad, [(0, e) for e in extra])

    # stacked per-axis coefficient tables, zero rows in the grid padding
    def stack_axis(a, w_a):
        cols = []
        for r in range(R):
            B = jnp.asarray(terms[r][a], dtype)
            B = jnp.pad(B, ((0, N[a] - npts[a]), (0, 0)))
            cols.append(B.T)                      # (w_a, N_a)
        return jnp.stack(cols)                    # (R, w_a, N_a)

    b0 = stack_axis(0, w0)
    b1 = jnp.transpose(stack_axis(1, w1), (0, 2, 1))   # (R, N1, w1)
    b2 = stack_axis(2, w2)

    grid = (N[0] // t0, N[1] // t1, N[2] // t2)
    kernel = _make_kernel(tile, pads, win, R, grid)
    # Mosaic materializes INDEX CONSTANTS in the default integer width:
    # under jax_enable_x64 that is i64, which tpu.memref_slice rejects
    # (and some converts then recurse) — trace the kernel with x64 off;
    # every operand/ref here is f32/i32 so semantics are unchanged.
    with jax.enable_x64(False):
        out = _call(kernel, grid, R, pads, tile, win, N, dtype,
                    interpret, x_pad, b0, b1, b2)
    if N != npts:
        out = out[tuple(slice(0, n) for n in npts)]
    return out


def _call(kernel, grid, R, pads, tile, win, N, dtype, interpret,
          x_pad, b0, b1, b2):
    t0, t1, t2 = tile
    p0, p1, p2 = pads
    w1, w2 = 2 * p1 + 1, 2 * p2 + 1
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((R, t1, w1), lambda i, j, l: (0, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((R, w2, t2), lambda i, j, l: (0, 0, l),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(tile, lambda i, j, l: (i, j, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(N, dtype),
        scratch_shapes=[pltpu.VMEM((2,) + win, dtype),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.VMEM((t0 + 2 * p0, _rup(t1 + 2 * p1, _SUB),
                                    t2), dtype),
                        pltpu.VMEM((t0 + 2 * p0, t1, t2), dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3),
    )(x_pad, b0, b1, b2)


def _pad_mixed(x_int, pads, periodic):
    """Ghost-pad with per-dim boundary rules (wrap vs zeros)."""
    out = x_int
    for a, (p, per) in enumerate(zip(pads, periodic)):
        pw = [(p, p) if b == a else (0, 0) for b in range(x_int.ndim)]
        out = jnp.pad(out, pw, mode="wrap" if per else "constant")
    return out
