"""Distributed banded transfers: per-axis halo-exchange + local gather.

Round-2 refinement of SURVEY.md §7.1.6–7: restriction/prolongation between
*block-partitioned* levels.  The key alignment invariant: padded global
sizes satisfy ``N_f = 2 · N_c`` per dim, so device d owns coarse rows
``[d·n_c, (d+1)·n_c)`` and exactly their image ``[2d·n_c, 2(d+1)·n_c)`` on
the fine level.  Every transfer row then reads only a ±W neighbor halo:

    restrict:  b_c[i] = Σ_t wR[I, t] · r_f[c0R[I] + t],  I = d·n_c + i
    prolong :  e_f[i] = Σ_t wP[I, t] · x_c[c0P[I] + t],  I = 2d·n_c + i

with the source vector halo-exchanged to width W (ppermute) and the
per-device index offsets computed from ``lax.axis_index`` inside shard_map.
Weight tables (n_global × W) are tiny and replicated.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from poms_tpu.parallel.halo import AxisSpec, HaloSpec, halo_exchange

__all__ = ["DistTransfer1D", "build_dist_transfer", "dist_apply_transfer"]


@jax.tree_util.register_pytree_node_class
@dataclass
class DistTransfer1D:
    """One axis of a distributed banded transfer.

    ``w``: (N_out_global, W) weights (zero-padded rows for grid padding);
    ``c0``: (N_out_global,) global source start per output row;
    ``ratio``: source blocks per output block (2 for restriction on the
    coarse side? no — ratio = n_out_loc→n_src_loc scaling: src_loc_start =
    out-block start mapped into source coordinates).
    """
    w: jnp.ndarray
    c0: jnp.ndarray
    n_out_loc: int
    n_src_loc: int
    halo: int

    def tree_flatten(self):
        return (self.w, self.c0), (self.n_out_loc, self.n_src_loc, self.halo)

    @classmethod
    def tree_unflatten(cls, aux, children):
        w, c0 = children
        return cls(w, c0, *aux)


def build_dist_transfer(P_like: np.ndarray, n_out_pad: int, n_src_pad: int,
                        m: int, dtype,
                        periodic: bool = False) -> DistTransfer1D:
    """From a dense (n_out, n_src) operator to the distributed band form.

    ``n_out_pad``/``n_src_pad``: padded global sizes (multiples of mesh m).
    Rows/cols beyond the true sizes get zero weights.

    ``periodic``: circulant operators have corner rows whose nonzeros WRAP
    (cols near both 0 and n−1).  Those columns are unwrapped to a
    contiguous window around each row's natural center (col ≈ i·n_src/
    n_out), so ``c0`` may be negative or exceed n_src−1; the wrapped
    source values land in the width-W ghost slabs the apply's periodic
    ppermute fills (periodic dims are never grid-padded —
    parallel/dist.py's guard).
    """
    n_out, n_src = P_like.shape
    if periodic:
        if n_out_pad != n_out or n_src_pad != n_src:
            raise ValueError("periodic transfers cannot be grid-padded")
        ratio = n_src / n_out
        cols = np.arange(n_src)[None, :]
        center = np.rint(np.arange(n_out) * ratio).astype(np.int64)[:, None]
        # representative of each column within [center - n/2, center + n/2)
        rep = (cols - center + n_src // 2) % n_src + center - n_src // 2
        nz = np.abs(P_like) > 0
        first = np.where(nz, rep, np.iinfo(np.int64).max).min(1)
        last = np.where(nz, rep, np.iinfo(np.int64).min).max(1)
        first = np.where(nz.any(1), first, 0)
        last = np.where(nz.any(1), last, 0)
        W = max(1, int((last - first + 1).max()))
        c0 = first.astype(np.int64)
        w = np.zeros((n_out, W))
        rows = np.arange(n_out)
        for t in range(W):
            src = (c0 + t) % n_src
            val = P_like[rows, src]
            val = np.where(rep[rows, src] == c0 + t, val, 0.0)
            w[:, t] = val
        return DistTransfer1D(
            w=jnp.asarray(w, dtype), c0=jnp.asarray(c0),
            n_out_loc=n_out // m, n_src_loc=n_src // m, halo=W)
    nz = np.abs(P_like) > 0
    first = np.where(nz.any(1), nz.argmax(1), 0)
    last = np.where(nz.any(1), n_src - 1 - nz[:, ::-1].argmax(1), 0)
    W = max(1, int((last - first + 1).max()))
    c0 = np.zeros(n_out_pad, np.int64)
    w = np.zeros((n_out_pad, W))
    c0[:n_out] = np.minimum(first, np.maximum(0, n_src - W))
    for t in range(W):
        idx = np.minimum(c0[:n_out] + t, n_src - 1)
        valid = c0[:n_out] + t < n_src
        w[:n_out, t] = np.where(valid, P_like[np.arange(n_out), idx], 0.0)
    # padded output rows keep w = 0, c0 clamped inside the padded source
    c0[n_out:] = 0
    n_out_loc = n_out_pad // m
    n_src_loc = n_src_pad // m
    return DistTransfer1D(
        w=jnp.asarray(w, dtype), c0=jnp.asarray(c0),
        n_out_loc=n_out_loc, n_src_loc=n_src_loc, halo=W)


def dist_apply_transfer(tbs: Tuple[DistTransfer1D, ...], x_loc: jnp.ndarray,
                        src_spec_axes, mesh_names) -> jnp.ndarray:
    """Apply per-axis distributed transfers to a local block.

    ``src_spec_axes``: the HaloSpec axes of the *source* level (periodic
    flags reused; sizes/pads overridden per transfer).  Applies axis 0..d-1
    in sequence; after axis a the local block has the output extent in dim a
    and still the source extent in the others.
    """
    nd = x_loc.ndim
    for a, tb in enumerate(tbs):
        h = tb.halo
        name = mesh_names[a]
        m = src_spec_axes[a].size
        per = src_spec_axes[a].periodic
        # halo-exchange the current block along axis a with width h
        cur_sizes = list(x_loc.shape)
        axes = []
        for b in range(nd):
            axes.append(AxisSpec(
                name=mesh_names[b] if b == a else None,
                size=m if b == a else 1,
                n_loc=cur_sizes[b],
                pad=h if b == a else 0,
                periodic=per if b == a else False))
        spec = HaloSpec(axes=tuple(axes))
        pad_widths = [(h, h) if b == a else (0, 0) for b in range(nd)]
        x_pad = jnp.pad(x_loc, pad_widths)
        x_pad = halo_exchange(x_pad, spec)
        # local gather: out[i] = Σ_t w[I, t] x_pad[c0[I] - src_start + h + t]
        d_idx = jax.lax.axis_index(name)
        out_start = d_idx * tb.n_out_loc
        src_start = d_idx * tb.n_src_loc
        w_loc = jax.lax.dynamic_slice_in_dim(tb.w, out_start, tb.n_out_loc, 0)
        c0_loc = jax.lax.dynamic_slice_in_dim(tb.c0, out_start,
                                              tb.n_out_loc, 0)
        base = c0_loc - src_start + h
        base = jnp.clip(base, 0, x_pad.shape[a] - 1)
        out = None
        for t in range(tb.w.shape[1]):
            idx = jnp.clip(base + t, 0, x_pad.shape[a] - 1)
            xt = jnp.take(x_pad, idx, axis=a)
            bshape = [1] * nd
            bshape[a] = tb.n_out_loc
            term = w_loc[:, t].reshape(bshape) * xt
            out = term if out is None else out + term
        x_loc = out
    return x_loc
