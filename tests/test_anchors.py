"""Literature-pinned two-grid convergence anchors (VERDICT r2 ask #10).

The oracle (poms_tpu/oracle) otherwise referees itself — both it and the
device path implement the same update rules, so a shared bug would pass
parity.  These tests pin BOTH paths to external, analytically-known
two-grid convergence factors from the standard multigrid literature
(local Fourier analysis values; see e.g. Trottenberg, Oosterlee & Schüller,
"Multigrid", Table 3.1 / §4; Briggs, Henson & McCormick, "A Multigrid
Tutorial", Ch. 5):

- 1D Poisson (3-point  [-1, 2, -1]), damped Jacobi ω = 2/3, TG(ν=1):
  asymptotic factor ρ = 1/3.
- 2D Poisson (5-point), red-black Gauss–Seidel, TG(1,0): ρ ≈ 0.25.
- 2D Poisson (5-point), red-black Gauss–Seidel, TG(1,1): ρ ≈ 0.074.

The measured asymptotic factor (homogeneous power iteration on the
two-grid operator, renormalized each cycle so the f64 floor is never hit)
must land in a band around the LFA value on both paths, agree between the
paths to roundoff, and be grid-independent.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the default fast selection
import scipy.sparse as sps

import jax.numpy as jnp

from poms_tpu.core.matrix import StencilMatrix
from poms_tpu.core.space import StencilVectorSpace
from poms_tpu.core.vector import StencilVector
from poms_tpu.mg.cycles import CycleConfig, cycle
from poms_tpu.mg.hierarchy import Level, galerkin_coarse_operator
from poms_tpu.mg.smoother import SmootherConfig
from poms_tpu.models.bspline import prolongation_interior_1d
from poms_tpu.ops.cholesky import factor_dense_cholesky
from poms_tpu.ops.transfer import bands_from_dense
from poms_tpu.oracle.mg_oracle import OracleMG


def _fd_poisson_matrix(space, d):
    """Constant-coefficient FD Laplacian band (3-point / 5-point), p=1."""
    npts = space.npts
    band = np.zeros(tuple(npts) + (3,) * d)
    center = (slice(None),) * d
    band[center + (1,) * d] = 2.0 * d
    for a in range(d):
        for off in (0, 2):
            idx = [1] * d
            idx[a] = off
            band[center + tuple(idx)] = -1.0
            # eliminated-Dirichlet convention: boundary rows carry zero
            # coefficients toward the (eliminated) outside points
            edge = [slice(None)] * d
            edge[a] = 0 if off == 0 else npts[a] - 1
            band[tuple(edge) + tuple(idx)] = 0.0
    return StencilMatrix.from_band(space, jnp.asarray(band, jnp.float64))


def _fd_levels(n_el, d):
    """Two-grid hierarchy for the FD Laplacian with linear (p=1 B-spline)
    interpolation and Galerkin coarse operator."""
    npts = tuple(ne - 1 for ne in n_el)
    space = StencilVectorSpace(npts=npts, pads=(1,) * d, periodic=False,
                               dtype=jnp.float64)
    A = _fd_poisson_matrix(space, d)
    n_el_c = tuple(ne // 2 for ne in n_el)
    P1s = [prolongation_interior_1d(nec, 1) for nec in n_el_c]
    prolong = tuple(bands_from_dense(P1, jnp.float64) for P1 in P1s)
    restrict = tuple(bands_from_dense(P1.T, jnp.float64) for P1 in P1s)
    coarse_npts = tuple(nec - 1 for nec in n_el_c)
    A_c = galerkin_coarse_operator(A, P1s, coarse_npts, (1,) * d)
    return [Level(A=A, restrict=restrict, prolong=prolong, chol=None),
            Level(A=A_c, restrict=None, prolong=None,
                  chol=factor_dense_cholesky(A_c))], space


def _rho_device(levels, space, cfg, iters=40, seed=3):
    """Asymptotic factor of the two-grid operator: renormalized power
    iteration on the homogeneous problem (b = 0)."""
    rng = np.random.default_rng(seed)
    e = rng.standard_normal(space.npts)
    e /= np.linalg.norm(e)
    b = StencilVector.zeros(space)
    rho = None
    for _ in range(iters):
        ev = StencilVector.from_interior(space, jnp.asarray(e))
        e2 = np.asarray(cycle(levels, 0, ev, b, cfg).interior)
        rho = np.linalg.norm(e2)
        e = e2 / rho
    return float(rho)


class _OracleShim:
    """Duck-typed problem for OracleMG over the FD operator."""

    def __init__(self, A, n_el, space):
        self.A = A
        self.degree = 1
        self.n_el = n_el
        self.space = space


def _rho_oracle(A, n_el, space, smoother, omega, nu1, nu2, iters=40, seed=3):
    ora = OracleMG(_OracleShim(A, n_el, space), num_levels=2, nu1=nu1,
                   nu2=nu2, smoother=smoother, omega=omega)
    rng = np.random.default_rng(seed)
    e = rng.standard_normal(space.npts).ravel()
    e /= np.linalg.norm(e)
    b = np.zeros_like(e)
    rho = None
    for _ in range(iters):
        e2 = ora.cycle(0, e, b)
        rho = np.linalg.norm(e2)
        e = e2 / rho
    return float(rho)


def test_anchor_1d_jacobi_third():
    """1D, ω=2/3 Jacobi, TG(1,0): LFA factor 1/3 — grid-independent."""
    rhos = {}
    for n in (64, 128):
        levels, space = _fd_levels((n,), 1)
        cfg = CycleConfig(nu1=1, nu2=0,
                          smoother=SmootherConfig("jacobi", 2.0 / 3.0))
        rhos[n] = _rho_device(levels, space, cfg)
        r_o = _rho_oracle(levels[0].A, (n,), space, "jacobi", 2.0 / 3.0,
                          1, 0)
        assert abs(rhos[n] - r_o) < 1e-10, (rhos[n], r_o)
    for n, r in rhos.items():
        assert 0.20 <= r <= 0.35, (n, r)   # LFA: 1/3
    assert abs(rhos[64] - rhos[128]) < 0.03   # grid independence


def test_anchor_2d_rbgs_quarter():
    """2D 5-point, RB-GS, TG(1,0): LFA factor ≈ 0.25."""
    levels, space = _fd_levels((32, 32), 2)
    cfg = CycleConfig(nu1=1, nu2=0,
                      smoother=SmootherConfig("rbgs", 1.0))
    r_d = _rho_device(levels, space, cfg)
    r_o = _rho_oracle(levels[0].A, (32, 32), space, "rbgs", 1.0, 1, 0)
    assert abs(r_d - r_o) < 1e-10, (r_d, r_o)
    assert 0.12 <= r_d <= 0.30, r_d


def test_anchor_2d_rbgs_v11():
    """2D 5-point, RB-GS, TG(1,1): LFA factor ≈ 0.074."""
    levels, space = _fd_levels((32, 32), 2)
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig("rbgs", 1.0))
    r_d = _rho_device(levels, space, cfg)
    r_o = _rho_oracle(levels[0].A, (32, 32), space, "rbgs", 1.0, 1, 1)
    assert abs(r_d - r_o) < 1e-10, (r_d, r_o)
    assert 0.02 <= r_d <= 0.12, r_d
