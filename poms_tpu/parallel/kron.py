"""Distributed Kronecker-sum operator apply (VERDICT r2 ask #7).

The Kronecker-sum operator (core/kron.py) beats the banded format's HBM
roofline 4–5× by streaming O(n) 1D coefficients instead of the
(2p+1)^d-per-point band; this module makes it the *distributed* hot-path
operator as well.  The apply is a chain of per-axis 1D banded
contractions; distribution adds, per axis pass,

  1. a width-p halo exchange of the current partial along THAT AXIS ONLY
     (one `ppermute` pair — the same idiom as parallel/transfers.py), and
  2. a local contraction against this device's rows of the (replicated,
     tiny) global 1D band, sliced by `lax.axis_index`.

Partial-product sharing mirrors core/kron.py::_apply_interior exactly
(same history-key scheme) and extends it to the halo exchanges: each
distinct partial is exchanged once per axis, then reused by every term
that contracts it.  For 3D Poisson that is 5 slab exchanges per apply
(1 + 2 + 2) versus the banded path's 3 — both O(surface).

All functions run inside `jax.shard_map`.  Grid padding follows the
identity-row convention of parallel/dist.py: padded 1D band rows are
identity (center 1), padded x entries are zero, and both invariants are
preserved by every apply/smooth (tests/test_dist_kron.py asserts
sharded ≡ serial to f64 roundoff).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from poms_tpu.parallel.halo import AxisSpec, HaloSpec, halo_exchange

__all__ = ["pad_band_1d_identity", "dist_kron_apply", "dist_kron_diag",
           "exchange_axis", "dist_kron_residual_df", "dist_dw_norm2"]


def pad_band_1d_identity(B: np.ndarray, N: int) -> np.ndarray:
    """Pad a 1D band (n, 2p+1) to (N, 2p+1) with identity rows.

    Identity rows keep padded grid entries decoupled AND give the padded
    region a unit diagonal, so smoother divisions stay finite (the per-dim
    factorization of parallel/dist.py::_pad_band_identity's invariant).
    """
    B = np.asarray(B)
    n, w = B.shape
    if N == n:
        return B
    out = np.zeros((N, w), B.dtype)
    out[:n] = B
    out[n:, (w - 1) // 2] = 1.0
    return out


def exchange_axis(x_loc: jnp.ndarray, a: int, ax: AxisSpec) -> jnp.ndarray:
    """Pad + halo-exchange a local block along axis ``a`` only (width =
    ``ax.pad``); other dims untouched.  Handles unsharded periodic dims by
    serial wrap (halo_exchange's name=None branch)."""
    nd = x_loc.ndim
    axes = tuple(
        AxisSpec(name=ax.name if b == a else None,
                 size=ax.size if b == a else 1,
                 n_loc=x_loc.shape[b],
                 pad=ax.pad if b == a else 0,
                 periodic=ax.periodic if b == a else False)
        for b in range(nd))
    x_pad = jnp.pad(x_loc, [(ax.pad, ax.pad) if b == a else (0, 0)
                            for b in range(nd)])
    return halo_exchange(x_pad, HaloSpec(axes=axes))


def _axis_contract(band_glob: jnp.ndarray, x_pad: jnp.ndarray, a: int,
                   ax: AxisSpec) -> jnp.ndarray:
    """y[..., i, ...] = Σ_t B[start+i, t] · x_pad[..., i+t, ...] on the
    local block (x_pad already exchanged along axis ``a``)."""
    nd = x_pad.ndim
    n_loc = ax.n_loc
    w = band_glob.shape[1]
    if ax.name is None:
        start = 0
        B_loc = band_glob
    else:
        start = jax.lax.axis_index(ax.name) * n_loc
        B_loc = jax.lax.dynamic_slice_in_dim(band_glob, start, n_loc, 0)
    out = None
    for t in range(w):
        sl = tuple(slice(t, t + n_loc) if b == a else slice(None)
                   for b in range(nd))
        bshape = [1] * nd
        bshape[a] = n_loc
        term = B_loc[:, t].reshape(bshape) * x_pad[sl]
        out = term if out is None else out + term
    return out


def dist_kron_apply(bands_by_axis: Sequence[Sequence[jnp.ndarray]],
                    labels: Sequence[Sequence[int]],
                    x_loc: jnp.ndarray, spec: HaloSpec,
                    fused: bool = True) -> jnp.ndarray:
    """(Σ_r ⊗_a B^(a)_{labels[a][r]})·x on a local block inside shard_map.

    ``bands_by_axis[a]``: the DISTINCT padded global 1D bands of axis a
    (replicated; (N_a, 2p_a+1) each).  ``labels[a][r]`` picks the band of
    term r — the same static sharing structure as
    KroneckerSumOperator._band_labels, so sharded ≡ serial term-for-term.

    ``fused=True`` (default; VERDICT r3 ask #8): ONE multi-dim halo
    exchange of x up front, pads carried through the axis contractions —
    d ppermute pairs per apply instead of one exchange round per distinct
    partial per axis (3D Poisson: 1 fused round vs 5 per-axis rounds; the
    RB-GS sweep drops from 10 exchange rounds to 2).  Cost: contractions
    of the earlier axes run over the still-padded extents of later dims
    (~(1 + 2p/n_loc)^(d−1) extra FLOPs — noise at production block sizes).
    Bitwise-identical output (same per-point contraction order).
    """
    d = x_loc.ndim
    n_terms = len(labels[0])
    if fused:
        # ONE multi-dim exchange; partials stay halo-padded on dims < a
        # while axis a is contracted.  A padded halo row of dim b < a is
        # the dim-b NEIGHBOR's interior (corners filled by the sequential
        # per-dim exchange), the neighbor shares this device's dim-a block
        # range (outer-product mesh), and the 1D contraction acts
        # independently per row with the replicated global band — so the
        # contracted partial's halo rows equal exactly what a fresh
        # exchange of the contracted partial would deliver.
        from poms_tpu.parallel.halo import pad_and_exchange

        x_pad = pad_and_exchange(x_loc, spec)
        partials = {r: x_pad for r in range(n_terms)}
        hist = {r: () for r in range(n_terms)}
        for a in range(d - 1, -1, -1):
            cache = {}   # one contraction per distinct (history, band)
            for r in range(n_terms):
                key = hist[r] + (labels[a][r],)
                if key not in cache:
                    cache[key] = _axis_contract(
                        bands_by_axis[a][labels[a][r]], partials[r], a,
                        spec.axes[a])
                partials[r] = cache[key]
                hist[r] = key
        out = None
        for r in range(n_terms):
            out = partials[r] if out is None else out + partials[r]
        return out
    partials = {r: x_loc for r in range(n_terms)}
    hist = {r: () for r in range(n_terms)}
    for a in range(d - 1, -1, -1):
        ax = spec.axes[a]
        ex_cache = {}   # one halo exchange per distinct partial
        cache = {}      # one contraction per distinct (partial, band)
        for r in range(n_terms):
            hkey = hist[r]
            if hkey not in ex_cache:
                ex_cache[hkey] = exchange_axis(partials[r], a, ax)
            key = hkey + (labels[a][r],)
            if key not in cache:
                cache[key] = _axis_contract(bands_by_axis[a][labels[a][r]],
                                            ex_cache[hkey], a, ax)
            partials[r] = cache[key]
            hist[r] = key
    out = None
    for r in range(n_terms):
        out = partials[r] if out is None else out + partials[r]
    return out


def _axis_contract_df(band_df_glob, xph, xpl, a: int, ax: AxisSpec):
    """Double-word twin of _axis_contract (both operands dw pairs; like it,
    extent-agnostic in the non-contracted dims, so it serves both the
    fused (padded partials) and per-axis forms)."""
    from poms_tpu.ops.twofloat import dw_add, dw_mul

    Bh_g, Bl_g = band_df_glob
    nd = xph.ndim
    n_loc = ax.n_loc
    w = Bh_g.shape[1]
    if ax.name is None:
        Bh_loc, Bl_loc = Bh_g, Bl_g
    else:
        start = jax.lax.axis_index(ax.name) * n_loc
        Bh_loc = jax.lax.dynamic_slice_in_dim(Bh_g, start, n_loc, 0)
        Bl_loc = jax.lax.dynamic_slice_in_dim(Bl_g, start, n_loc, 0)
    oh = ol = None
    for t in range(w):
        sl = tuple(slice(t, t + n_loc) if b == a else slice(None)
                   for b in range(nd))
        bshape = [1] * nd
        bshape[a] = n_loc
        th, tl = dw_mul(Bh_loc[:, t].reshape(bshape),
                        Bl_loc[:, t].reshape(bshape), xph[sl], xpl[sl])
        if oh is None:
            oh, ol = th, tl
        else:
            oh, ol = dw_add(oh, ol, th, tl)
    return oh, ol


def dist_kron_residual_df(bands_df_by_axis, labels, bh, bl, xh, xl,
                          spec: HaloSpec, fused: bool = True):
    """r = b − A·x in double-word f32 on a local block inside shard_map —
    the distributed twin of ops/twofloat.py::residual_kron_df (VERDICT r2
    ask #3, distributed half): the sharded defect-correction outer loop
    with NO f64 emulation.  Halo ghosts are exchanged separately for the
    hi and lo words (ppermute is exact, so dw invariants survive).

    ``bands_df_by_axis[a]``: tuple of (hi, lo) f32 pairs of the distinct
    padded global 1D bands of axis a.

    ``fused=True``: one up-front multi-dim exchange of (xh, xl) instead of
    per-axis per-partial exchanges — same scheme (and same correctness
    argument) as :func:`dist_kron_apply`; 2 exchange rounds per residual
    instead of 10 for 3D Poisson.
    """
    from poms_tpu.ops.twofloat import dw_add

    d = xh.ndim
    n_terms = len(labels[0])
    if fused:
        from poms_tpu.parallel.halo import pad_and_exchange

        xph = pad_and_exchange(xh, spec)
        xpl = pad_and_exchange(xl, spec)
        partials = {r: (xph, xpl) for r in range(n_terms)}
        hist = {r: () for r in range(n_terms)}
        for a in range(d - 1, -1, -1):
            cache = {}
            for r in range(n_terms):
                key = hist[r] + (labels[a][r],)
                if key not in cache:
                    ph, plo = partials[r]
                    cache[key] = _axis_contract_df(
                        bands_df_by_axis[a][labels[a][r]], ph, plo, a,
                        spec.axes[a])
                partials[r] = cache[key]
                hist[r] = key
    else:
        partials = {r: (xh, xl) for r in range(n_terms)}
        hist = {r: () for r in range(n_terms)}
        for a in range(d - 1, -1, -1):
            ax = spec.axes[a]
            ex_cache = {}
            cache = {}
            for r in range(n_terms):
                hkey = hist[r]
                if hkey not in ex_cache:
                    ph, plo = partials[r]
                    ex_cache[hkey] = (exchange_axis(ph, a, ax),
                                      exchange_axis(plo, a, ax))
                key = hkey + (labels[a][r],)
                if key not in cache:
                    xph_r, xpl_r = ex_cache[hkey]
                    cache[key] = _axis_contract_df(
                        bands_df_by_axis[a][labels[a][r]], xph_r, xpl_r,
                        a, ax)
                partials[r] = cache[key]
                hist[r] = key
    axh = axl = None
    for r in range(n_terms):
        ph, plo = partials[r]
        if axh is None:
            axh, axl = ph, plo
        else:
            axh, axl = dw_add(axh, axl, ph, plo)
    return dw_add(bh, bl, -axh, -axl)


def dist_dw_norm2(rh, rl, spec: HaloSpec):
    """Global ‖r‖₂ of a sharded double-word field: local dw pairwise-tree
    sum of squares, then one scalar f64 psum (O(1) emulated work)."""
    from poms_tpu.ops.twofloat import dw_mul, dw_sum_tree

    fh = rh.reshape(-1)
    fl = rl.reshape(-1)
    sh, sl = dw_mul(fh, fl, fh, fl)
    local = dw_sum_tree(sh, sl)
    names = spec.names
    total = jax.lax.psum(local, names) if names else local
    return jnp.sqrt(total)


def dist_kron_diag(bands_by_axis, labels, spec: HaloSpec) -> jnp.ndarray:
    """Local block of diag(Σ ⊗B) = Σ ⊗diag(B) (computed in shard_map from
    the replicated bands — no communication)."""
    d = len(spec.axes)
    n_terms = len(labels[0])
    out = None
    for r in range(n_terms):
        dr = None
        for a in range(d):
            ax = spec.axes[a]
            B = bands_by_axis[a][labels[a][r]]
            p = (B.shape[1] - 1) // 2
            if ax.name is None:
                d1 = B[:, p]
            else:
                start = jax.lax.axis_index(ax.name) * ax.n_loc
                d1 = jax.lax.dynamic_slice_in_dim(B[:, p], start, ax.n_loc, 0)
            dr = d1 if dr is None else jnp.tensordot(dr, d1, axes=0)
        out = dr if out is None else out + dr
    return out
