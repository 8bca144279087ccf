"""Kronecker-sum operator: structure-exploiting SpMV (TPU-first extra)."""
import numpy as np
import pytest

from poms_tpu.core.vector import StencilVector
from poms_tpu.mg.cycles import CycleConfig
from poms_tpu.mg.hierarchy import _kron_operator_from_1d, build_hierarchy
from poms_tpu.mg.smoother import SmootherConfig
from poms_tpu.mg.solver import MultigridSolver
from poms_tpu.models.poisson import poisson_problem


def _kron_op(prob):
    return _kron_operator_from_1d([(s.K, s.M) for s in prob.splines],
                                  prob.space)


@pytest.mark.parametrize("dim,n_el,p", [(1, 12, 2), (2, (8, 10), 3),
                                        (3, 6, 2)])
def test_kron_dot_matches_banded(dim, n_el, p):
    prob = poisson_problem(dim, n_el, degree=p)
    K = _kron_op(prob)
    rng = np.random.default_rng(0)
    x = StencilVector.from_interior(prob.space,
                                    rng.standard_normal(prob.space.npts))
    y_k = K.dot(x)
    y_b = prob.A.dot(x)
    np.testing.assert_allclose(np.asarray(y_k.interior),
                               np.asarray(y_b.interior), rtol=1e-12,
                               atol=1e-12)


def test_kron_diagonal_and_to_stencil():
    prob = poisson_problem(2, (6, 8), degree=2)
    K = _kron_op(prob)
    np.testing.assert_allclose(np.asarray(K.diagonal()),
                               np.asarray(prob.A.diagonal()), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(K.to_stencil().band),
                               np.asarray(prob.A.band), rtol=1e-12,
                               atol=1e-14)
    np.testing.assert_allclose(K.toarray(), prob.A.toarray(), atol=1e-12)


def test_kron_transpose():
    prob = poisson_problem(2, (6, 8), degree=2)
    K = _kron_op(prob)
    np.testing.assert_allclose(K.T.toarray(), prob.A.toarray().T, atol=1e-12)


@pytest.mark.parametrize("smoother", ["jacobi", "rbgs"])
def test_kron_solver_matches_banded(smoother):
    prob = poisson_problem(2, 32, degree=3)
    cfg = CycleConfig(smoother=SmootherConfig(smoother, 0.8))
    mg_b = MultigridSolver(prob, num_levels=3, cfg=cfg, operator="banded")
    mg_k = MultigridSolver(prob, num_levels=3, cfg=cfg, operator="kron")
    res_b = mg_b.solve(tol=1e-10, maxiter=60)
    res_k = mg_k.solve(tol=1e-10, maxiter=60)
    assert res_k.converged and res_k.iterations == res_b.iterations
    np.testing.assert_allclose(res_k.residuals, res_b.residuals,
                               rtol=1e-6, atol=1e-13)


def test_kron_3d_solver():
    prob = poisson_problem(3, 8, degree=2)
    cfg = CycleConfig(smoother=SmootherConfig("jacobi", 0.7))
    mg = MultigridSolver(prob, num_levels=2, cfg=cfg, operator="kron")
    res = mg.solve(tol=1e-9, maxiter=60)
    assert res.converged


def test_kron_matmul_apply_parity(monkeypatch):
    """Opt-in MXU (dense-matmul) kron apply matches the shifted-MAC path.

    Measured on chip (128³ p3 f32): matmul 0.697 ms (HIGH precision) vs
    VPU 0.709 — a WASH, because the apply is HBM-bound, not flop-bound;
    the MXU's free flops don't help a streaming kernel (BASELINE.md r5).
    Kept opt-in as the measured answer to 'why not the MXU?'."""
    import numpy as np
    import jax.numpy as jnp

    from poms_tpu.core.kron import KroneckerSumOperator
    from poms_tpu.core.space import StencilVectorSpace

    rng = np.random.default_rng(5)
    npts, p = (8, 12, 10), 2
    sp = StencilVectorSpace(npts=npts, pads=(p,) * 3, periodic=False,
                            dtype=jnp.float32)
    Ks = [jnp.asarray(rng.standard_normal((n, 2 * p + 1)), jnp.float32) / 4
          for n in npts]
    Ms = [jnp.asarray(rng.standard_normal((n, 2 * p + 1)), jnp.float32) / 4
          for n in npts]
    terms = [[Ks[b] if b == a else Ms[b] for b in range(3)]
             for a in range(3)]
    op = KroneckerSumOperator(sp, terms)
    x = jnp.asarray(rng.standard_normal(npts), jnp.float32)
    monkeypatch.delenv("POMS_TPU_KRON", raising=False)
    ref = op._apply_interior(x)
    monkeypatch.setenv("POMS_TPU_KRON", "matmul")
    out = op._apply_interior(x)
    denom = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) / denom < 1e-5
