"""B-spline basis / assembly / transfer-construction tests (SURVEY.md §4)."""
import numpy as np
import pytest

from poms_tpu.models.bspline import (assemble_spline_1d, basis_funs,
                                     ders_basis_funs, eval_spline, find_span,
                                     open_uniform_knots,
                                     prolongation_full_1d,
                                     prolongation_interior_1d, sin_moment_1d)
from poms_tpu.models.poisson import (l2_error_manufactured, poisson_problem)


@pytest.mark.parametrize("p", [1, 2, 3, 4])
def test_partition_of_unity(p):
    n_el = 7
    T = open_uniform_knots(n_el, p)
    for x in np.linspace(0, 1, 33):
        k = find_span(T, p, x)
        N = basis_funs(T, p, k, x)
        assert np.isclose(N.sum(), 1.0)
        assert (N >= -1e-14).all()


@pytest.mark.parametrize("p", [2, 3])
def test_derivatives_vs_fd(p):
    n_el = 5
    T = open_uniform_knots(n_el, p)
    h = 1e-6
    for x in [0.13, 0.5, 0.77]:
        k = find_span(T, p, x)
        d = ders_basis_funs(T, p, k, x, 1)
        Np = basis_funs(T, p, find_span(T, p, x + h), x + h)
        Nm = basis_funs(T, p, find_span(T, p, x - h), x - h)
        assert find_span(T, p, x + h) == k and find_span(T, p, x - h) == k
        fd = (Np - Nm) / (2 * h)
        np.testing.assert_allclose(d[1], fd, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("p", [1, 2, 3])
def test_stiffness_vs_dense_quadrature(p):
    """Band assembly ≡ brute-force dense quadrature."""
    n_el = 4
    sp = assemble_spline_1d(n_el, p)
    T, nb = sp.knots, sp.nb
    # brute force with very fine midpoint rule
    m = 4000
    xs = (np.arange(m) + 0.5) / m
    B = np.zeros((m, nb))
    dB = np.zeros((m, nb))
    for r, x in enumerate(xs):
        k = find_span(T, p, x)
        d = ders_basis_funs(T, p, k, x, 1)
        B[r, k - p:k + 1] = d[0]
        dB[r, k - p:k + 1] = d[1]
    K_dense = dB.T @ dB / m
    M_dense = B.T @ B / m
    # compare bands (full matrices)
    for i in range(nb):
        for off in range(2 * p + 1):
            j = i + off - p
            if 0 <= j < nb:
                assert sp.K_full[i, off] == pytest.approx(K_dense[i, j], abs=2e-3)
                assert sp.M_full[i, off] == pytest.approx(M_dense[i, j], abs=1e-6)


def test_stiffness_symmetry_and_rowsum():
    sp = assemble_spline_1d(8, 3)
    import scipy.sparse as sps
    from poms_tpu.core.matrix import StencilMatrix
    from poms_tpu.core.space import StencilVectorSpace
    space = StencilVectorSpace(npts=(sp.n,), pads=(3,), periodic=False)
    A = StencilMatrix.from_band(space, sp.K).toarray()
    np.testing.assert_allclose(A, A.T, atol=1e-13)
    w = np.linalg.eigvalsh(A)
    assert w.min() > 0  # SPD


@pytest.mark.parametrize("p", [1, 2, 3])
def test_prolongation_exact_embedding(p):
    """Coarse spline == fine spline with prolonged coefficients (nestedness)."""
    n_el_c = 5
    P = prolongation_full_1d(n_el_c, p)
    Tc = open_uniform_knots(n_el_c, p)
    Tf = open_uniform_knots(2 * n_el_c, p)
    rng = np.random.default_rng(0)
    c = rng.standard_normal(n_el_c + p)
    xs = np.linspace(0, 1, 101)
    vc = eval_spline(Tc, p, c, xs)
    vf = eval_spline(Tf, p, P @ c, xs)
    np.testing.assert_allclose(vf, vc, atol=1e-12)


def test_interior_prolongation_shape():
    p, n_el_c = 3, 6
    Pi = prolongation_interior_1d(n_el_c, p)
    assert Pi.shape == (2 * n_el_c + p - 2, n_el_c + p - 2)


def test_poisson_1d_solve_accuracy():
    """Direct solve of the 1D system: O(h^{p+1}) L2 error for u=sin(πx)."""
    errs = []
    for n_el in (8, 16):
        prob = poisson_problem(1, n_el, degree=3)
        A = prob.A.toarray()
        b = np.asarray(prob.b.interior)
        u = np.linalg.solve(A, b)
        from poms_tpu.core.vector import StencilVector
        uv = StencilVector.from_interior(prob.space, u)
        errs.append(l2_error_manufactured(prob, uv, pts_per_dim=256))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 3.5  # expect ~4 for cubics


def test_poisson_2d_matches_kron():
    import scipy.sparse as sps
    prob = poisson_problem(2, (4, 5), degree=2)
    s1, s2 = prob.splines
    from poms_tpu.core.matrix import StencilMatrix
    from poms_tpu.core.space import StencilVectorSpace
    sp1 = StencilVectorSpace(npts=(s1.n,), pads=(2,))
    sp2 = StencilVectorSpace(npts=(s2.n,), pads=(2,))
    K1 = StencilMatrix.from_band(sp1, s1.K).toarray()
    M1 = StencilMatrix.from_band(sp1, s1.M).toarray()
    K2 = StencilMatrix.from_band(sp2, s2.K).toarray()
    M2 = StencilMatrix.from_band(sp2, s2.M).toarray()
    A_kron = np.kron(K1, M2) + np.kron(M1, K2)
    np.testing.assert_allclose(prob.A.toarray(), A_kron, atol=1e-12)


def test_poisson_3d_small_solve():
    prob = poisson_problem(3, 4, degree=2)
    A = prob.A.toarray()
    np.testing.assert_allclose(A, A.T, atol=1e-12)
    b = np.asarray(prob.b.interior).ravel()
    u = np.linalg.solve(A, b)
    from poms_tpu.core.vector import StencilVector
    uv = StencilVector.from_interior(prob.space, u.reshape(prob.space.npts))
    err = l2_error_manufactured(prob, uv, pts_per_dim=24)
    assert err < 5e-3


def test_sin_moment_accuracy():
    sp = assemble_spline_1d(16, 3)
    s = sin_moment_1d(sp, m=1, interior=False)
    # sum of moments = ∫ sin(πx) Σ B_i = ∫ sin = 2/π  (partition of unity)
    assert np.isclose(s.sum(), 2 / np.pi, rtol=1e-10)
