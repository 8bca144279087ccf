"""Periodic (circulant) spline problems — capability parity for the
reference's periodicity flags (SURVEY.md §2 C1)."""
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from poms_tpu.core.vector import StencilVector
from poms_tpu.mg.cycles import CycleConfig, cycle
from poms_tpu.mg.smoother import SmootherConfig
from poms_tpu.models.bspline import (assemble_periodic_1d,
                                     prolongation_periodic_1d)
from poms_tpu.models.periodic import (build_periodic_hierarchy,
                                      periodic_problem)


def test_periodic_operator_properties():
    prob = periodic_problem(2, 16, degree=2, shift=1.0)
    A = prob.A.toarray()
    np.testing.assert_allclose(A, A.T, atol=1e-12)
    assert np.linalg.eigvalsh(A).min() > 0  # SPD thanks to the shift
    # translation invariance: circulant in each dim (compare two rows)
    n = prob.space.npts
    A4 = A.reshape(n + n)
    np.testing.assert_allclose(A4[3, 4], np.roll(np.roll(A4[4, 5], -1, 0),
                                                 -1, 1), atol=1e-12)


def test_periodic_prolongation_two_scale():
    """Periodic two-scale P reproduces coarse periodic splines exactly:
    check via the circulant mass identity M_c = Pᵀ M_f P."""
    p = 3
    Kc, Mc = assemble_periodic_1d(8, p)
    Kf, Mf = assemble_periodic_1d(16, p)

    def dense(Bb):
        n = Bb.shape[0]
        D = np.zeros((n, n))
        for off in range(2 * p + 1):
            cols = (np.arange(n) + off - p) % n
            D[np.arange(n), cols] += Bb[:, off]
        return D

    P = prolongation_periodic_1d(8, p)
    np.testing.assert_allclose(P.T @ dense(Mf) @ P, dense(Mc), atol=1e-12)
    np.testing.assert_allclose(P.T @ dense(Kf) @ P, dense(Kc), atol=1e-10)


@pytest.mark.parametrize("dim,n_el,p", [(1, 64, 2), (2, 32, 3)])
def test_periodic_mg_solve(dim, n_el, p):
    prob = periodic_problem(dim, n_el, degree=p, shift=1.0)
    levels = build_periodic_hierarchy(prob, num_levels=2)
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig("chebyshev", cheb_fraction=16.0))
    from poms_tpu.mg.smoother import attach_spectral_estimates

    lams = attach_spectral_estimates(levels, cfg.smoother)
    x = StencilVector.zeros(prob.space)
    res = [float((prob.b - prob.A.dot(x)).norm())]
    for _ in range(30):
        x = cycle(levels, 0, x, prob.b, cfg, lams)
        res.append(float((prob.b - prob.A.dot(x)).norm()))
        if res[-1] < 1e-10:
            break
    assert res[-1] < 1e-10, res
    # against scipy direct solve
    u_ref = spla.spsolve(prob.A.tocsr(), np.asarray(prob.b.interior).ravel())
    np.testing.assert_allclose(np.asarray(x.interior).ravel(), u_ref,
                               rtol=1e-7, atol=1e-9)


def test_periodic_mixed_twofloat_reaches_1e10():
    """Serial mixed twofloat defect correction on the periodic
    shifted-Laplace kron operator (round-4 gap: DistributedMG supported
    periodic problems, MixedPrecisionMG did not)."""
    import jax.numpy as jnp

    from poms_tpu.mg.mixed import MixedPrecisionMG

    prob = periodic_problem(2, 32, degree=3, shift=1.0)
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig("chebyshev",
                                              cheb_fraction=16.0))
    mg = MixedPrecisionMG(prob, num_levels=2, cfg=cfg, operator="kron",
                          residual="twofloat")
    res = mg.solve(tol=1e-10, maxiter=60)
    assert res.converged, res.residuals[-3:]
    r = prob.b.interior - prob.A.dot(res.x).interior
    assert float(jnp.linalg.norm(r)) <= 5e-10
