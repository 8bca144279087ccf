"""Periodic tensor-product problems (Helmholtz u − Δu, circulant splines).

Periodicity is a reference capability (SURVEY.md §2 C1 periodicity flags).
The pure-Neumann/periodic Laplacian has the constant nullspace, so the
canonical periodic test problem is the shifted operator

    A = σ·(⊗M) + Σ_a M⊗…K_a…⊗M        (σ > 0 ⇒ SPD)

with circulant per-dim bands (models/bspline.py::assemble_periodic_1d) and
two-scale-relation transfers.  Everything downstream (ghost wrap, wrapping
ppermute, banded SpMV) already supports periodic dims; this module adds the
assembly + hierarchy glue and exposes the same Level list the cycle driver
consumes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from poms_tpu.core.matrix import StencilMatrix
from poms_tpu.core.space import StencilVectorSpace
from poms_tpu.core.vector import StencilVector
from poms_tpu.mg.hierarchy import Level
from poms_tpu.models.bspline import (assemble_periodic_1d,
                                     prolongation_periodic_1d)
from poms_tpu.ops.cholesky import factor_dense_cholesky
from poms_tpu.ops.transfer import bands_from_dense

__all__ = ["PeriodicProblem", "periodic_problem",
           "build_periodic_hierarchy"]


@dataclass
class PeriodicProblem:
    dim: int
    degree: int
    n_el: Tuple[int, ...]
    shift: float
    space: StencilVectorSpace
    A: StencilMatrix
    b: StencilVector
    bands_1d: list  # per-dim (K, M) numpy circulant bands


def _band_from_1d(bands_1d, shift, space):
    """σ·⊗M + Σ_a ⊗(K/M) composed on device (same einsum as poisson)."""
    d = len(bands_1d)
    Ks = [jnp.asarray(b[0], space.dtype) for b in bands_1d]
    Ms = [jnp.asarray(b[1], space.dtype) for b in bands_1d]

    def outer(factors):
        in_subs, out_grid, out_off = [], [], []
        for b in range(d):
            gi, oi = chr(ord("a") + b), chr(ord("n") + b)
            in_subs.append(gi + oi)
            out_grid.append(gi)
            out_off.append(oi)
        expr = ",".join(in_subs) + "->" + "".join(out_grid) + "".join(out_off)
        return jnp.einsum(expr, *factors)

    total = shift * outer(Ms)
    for a in range(d):
        total = total + outer([Ks[b] if b == a else Ms[b] for b in range(d)])
    return total


def periodic_problem(dim: int, n_el, degree: int = 3, shift: float = 1.0,
                     dtype=jnp.float64, seed: int = 0) -> PeriodicProblem:
    """Assemble the periodic shifted-Laplace system with a random RHS."""
    if isinstance(n_el, int):
        n_el = (n_el,) * dim
    n_el = tuple(int(x) for x in n_el)
    bands_1d = [assemble_periodic_1d(ne, degree) for ne in n_el]
    space = StencilVectorSpace(npts=n_el, pads=degree, periodic=True,
                               dtype=dtype)
    A = StencilMatrix.from_band(space, _band_from_1d(bands_1d, shift, space))
    rng = np.random.default_rng(seed)
    b = StencilVector.from_interior(
        space, jnp.asarray(rng.standard_normal(n_el), dtype))
    return PeriodicProblem(dim=dim, degree=degree, n_el=n_el, shift=shift,
                           space=space, A=A, b=b, bands_1d=bands_1d)


def _coarse_bands_periodic(bands_1d, P1s):
    """1D circulant Galerkin RAP: dense triple product + wrapped band
    extraction (periodic nested spaces keep the 2p+1 band)."""
    out = []
    for (Kb, Mb), P1 in zip(bands_1d, P1s):
        n = Kb.shape[0]
        p = (Kb.shape[1] - 1) // 2

        def dense(Bb):
            D = np.zeros((n, n))
            for off in range(2 * p + 1):
                cols = (np.arange(n) + off - p) % n
                D[np.arange(n), cols] += Bb[:, off]
            return D

        nc = P1.shape[1]
        Kc = P1.T @ dense(Kb) @ P1
        Mc = P1.T @ dense(Mb) @ P1
        Kcb = np.zeros((nc, 2 * p + 1))
        Mcb = np.zeros((nc, 2 * p + 1))
        for off in range(2 * p + 1):
            cols = (np.arange(nc) + off - p) % nc
            Kcb[:, off] = Kc[np.arange(nc), cols]
            Mcb[:, off] = Mc[np.arange(nc), cols]
        # verify the circulant band captured everything
        if abs(dense_sum := (np.abs(Kc).sum() - np.abs(Kcb).sum())) > \
                1e-8 * max(np.abs(Kc).sum(), 1.0):
            raise AssertionError("periodic coarse operator escaped the band")
        out.append((Kcb, Mcb))
    return out


def _kron_periodic(bands_1d, shift, space):
    """σ·⊗M + Σ_a ⊗(K_a slot a) as a KroneckerSumOperator (σ folded into
    the first M factor of the shift term; M bands shared across terms so
    the apply reuses partial products)."""
    from poms_tpu.core.kron import KroneckerSumOperator

    d = len(bands_1d)
    Ks = [jnp.asarray(b[0], space.dtype) for b in bands_1d]
    Ms = [jnp.asarray(b[1], space.dtype) for b in bands_1d]
    shift_term = [shift * Ms[0]] + [Ms[b] for b in range(1, d)]
    terms = [shift_term] + [[Ks[b] if b == a else Ms[b] for b in range(d)]
                            for a in range(d)]
    return KroneckerSumOperator(space, terms)


def build_periodic_hierarchy(problem: PeriodicProblem, num_levels: int,
                             operator: str = "banded"):
    """Levels finest→coarsest for the periodic shifted-Laplace problem."""
    p = problem.degree
    d = problem.dim
    n_el = problem.n_el
    bands_1d = problem.bands_1d
    A = problem.A
    if operator == "kron":
        A = _kron_periodic(bands_1d, problem.shift, problem.space)
    levels = []
    for lev in range(num_levels - 1):
        if any(ne % 2 or ne // 2 <= 2 * p for ne in n_el):
            raise ValueError(f"cannot coarsen periodic n_el={n_el} "
                             f"(need even with n/2 > 2p)")
        n_el_c = tuple(ne // 2 for ne in n_el)
        P1s = [prolongation_periodic_1d(nec, p) for nec in n_el_c]
        prolong = tuple(bands_from_dense(P1, A.space.dtype) for P1 in P1s)
        restrict = tuple(bands_from_dense(P1.T, A.space.dtype) for P1 in P1s)
        bands_1d = _coarse_bands_periodic(bands_1d, P1s)
        coarse_space = StencilVectorSpace(npts=n_el_c, pads=(p,) * d,
                                          periodic=True, dtype=A.space.dtype)
        if operator == "kron":
            A_c = _kron_periodic(bands_1d, problem.shift, coarse_space)
        else:
            A_c = StencilMatrix.from_band(
                coarse_space,
                _band_from_1d(bands_1d, problem.shift, coarse_space))
        levels.append(Level(A=A, restrict=restrict, prolong=prolong,
                            chol=None))
        A, n_el = A_c, n_el_c
    levels.append(Level(A=A, restrict=None, prolong=None,
                        chol=factor_dense_cholesky(A)))
    return levels
