"""Transfer-band application + Galerkin RAP tests (SURVEY.md §2 C6/C8)."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from poms_tpu.mg.hierarchy import galerkin_coarse_operator
from poms_tpu.models.bspline import prolongation_interior_1d
from poms_tpu.models.poisson import poisson_problem
from poms_tpu.ops.transfer import apply_transfer, bands_from_dense


@pytest.mark.parametrize("p", [1, 2, 3])
def test_banded_prolongation_matches_dense_1d(p):
    P = prolongation_interior_1d(6, p)
    tb = bands_from_dense(P)
    rng = np.random.default_rng(0)
    xc = rng.standard_normal(P.shape[1])
    y = apply_transfer((tb,), jnp.asarray(xc))
    np.testing.assert_allclose(np.asarray(y), P @ xc, atol=1e-13)


@pytest.mark.parametrize("p", [1, 2, 3])
def test_banded_restriction_matches_dense_1d(p):
    P = prolongation_interior_1d(6, p)
    tb = bands_from_dense(P.T)
    rng = np.random.default_rng(1)
    xf = rng.standard_normal(P.shape[0])
    y = apply_transfer((tb,), jnp.asarray(xf))
    np.testing.assert_allclose(np.asarray(y), P.T @ xf, atol=1e-13)


def test_banded_transfer_2d_tensor_product():
    p = 3
    P1 = prolongation_interior_1d(4, p)
    P2 = prolongation_interior_1d(6, p)
    tbs = (bands_from_dense(P1), bands_from_dense(P2))
    rng = np.random.default_rng(2)
    xc = rng.standard_normal((P1.shape[1], P2.shape[1]))
    y = apply_transfer(tbs, jnp.asarray(xc))
    y_ref = (np.kron(P1, P2) @ xc.ravel()).reshape(P1.shape[0], P2.shape[0])
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-12)


@pytest.mark.parametrize("dim,n_el,p", [(1, 8, 3), (2, (4, 6), 2), (3, 4, 2)])
def test_galerkin_rap_vs_scipy(dim, n_el, p):
    prob = poisson_problem(dim, n_el, degree=p)
    n_el_t = prob.n_el
    n_el_c = tuple(ne // 2 for ne in n_el_t)
    P1s = [prolongation_interior_1d(nec, p) for nec in n_el_c]
    coarse_npts = tuple(nec + p - 2 for nec in n_el_c)
    Ac = galerkin_coarse_operator(prob.A, P1s, coarse_npts, (p,) * dim)
    P = None
    for P1 in P1s:
        m = sps.csr_matrix(P1)
        P = m if P is None else sps.kron(P, m, format="csr")
    Ac_ref = (P.T @ prob.A.tocsr() @ P).toarray()
    np.testing.assert_allclose(Ac.toarray(), Ac_ref, atol=1e-12)


@pytest.mark.parametrize("dim,n_el,p", [(1, 8, 3), (2, (6, 4), 3)])
def test_galerkin_equals_rediscretization(dim, n_el, p):
    """Nested spline spaces: RAP coarse operator == directly assembled."""
    prob_f = poisson_problem(dim, n_el, degree=p)
    n_el_c = tuple(ne // 2 for ne in prob_f.n_el)
    prob_c = poisson_problem(dim, n_el_c, degree=p)
    P1s = [prolongation_interior_1d(nec, p) for nec in n_el_c]
    Ac = galerkin_coarse_operator(prob_f.A, P1s, prob_c.space.npts,
                                  (p,) * dim)
    np.testing.assert_allclose(Ac.toarray(), prob_c.A.toarray(), atol=1e-11)


def test_tensor_hierarchy_equals_spgemm_hierarchy():
    """'tensor' (1D dense RAP via Kronecker structure) == 'spgemm' path."""
    from poms_tpu.mg.hierarchy import build_hierarchy
    for dim, n_el, p in [(1, 16, 3), (2, (8, 12), 2), (3, 4, 2)]:
        prob = poisson_problem(dim, n_el, degree=p)
        lv_t = build_hierarchy(prob, 3 if dim == 1 else 2, method="tensor")
        lv_s = build_hierarchy(prob, 3 if dim == 1 else 2, method="spgemm")
        for lt, ls in zip(lv_t, lv_s):
            np.testing.assert_allclose(np.asarray(lt.A.band),
                                       np.asarray(ls.A.band),
                                       rtol=1e-10, atol=1e-12)
