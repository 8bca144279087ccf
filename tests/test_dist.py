"""Distributed (shard_map) tests on the 8-device virtual CPU mesh.

SURVEY.md §4 tier (a): same code, virtual devices; gates from §7.1.6 —
sharded ≡ serial to f64 roundoff on SpMV, smoothers, norms and whole
V-cycle solves (config 4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from poms_tpu.core.vector import StencilVector
from poms_tpu.mg.cycles import CycleConfig
from poms_tpu.mg.smoother import SmootherConfig
from poms_tpu.mg.solver import MultigridSolver
from poms_tpu.models.poisson import poisson_problem
from poms_tpu.parallel.dist import DistributedMG, _pad_band_identity
from poms_tpu.parallel.halo import (HaloSpec, dist_norm2, dist_spmv,
                                    pad_and_exchange)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _sharded_spmv(space, band_t, x_int, mesh_shape):
    """Run dist_spmv through shard_map on a padded global array."""
    d = space.ndim
    names = tuple(f"ax{a}" for a in range(d))
    mesh = jax.make_mesh(mesh_shape, names)
    npts = space.npts
    N = tuple(-(-npts[a] // mesh_shape[a]) * mesh_shape[a] for a in range(d))
    n_loc = tuple(N[a] // mesh_shape[a] for a in range(d))
    spec = HaloSpec.build(names, mesh_shape, n_loc, space.pads, space.periodic)
    band_pad = jnp.asarray(
        _pad_band_identity(np.asarray(band_t), npts, N, space.pads))
    x_pad = jnp.pad(jnp.asarray(x_int),
                    [(0, N[a] - npts[a]) for a in range(d)])

    f = jax.shard_map(
        lambda bl, xl: dist_spmv(bl, xl, spec),
        mesh=mesh,
        in_specs=(P(*((None,) * d + names)), P(*names)),
        out_specs=P(*names))
    y = jax.jit(f)(band_pad, x_pad)
    return np.asarray(y)[tuple(slice(0, n) for n in npts)]


@pytest.mark.parametrize("dim,n_el,mesh_shape,periodic", [
    (1, 32, (8,), False),
    (1, 32, (4,), False),
    (2, 12, (4, 2), False),
    (2, 10, (2, 2), False),
    (3, 6, (2, 2, 2), False),
])
def test_dist_spmv_matches_serial(dim, n_el, mesh_shape, periodic):
    prob = poisson_problem(dim, n_el, degree=2)
    x_int = np.random.default_rng(0).standard_normal(prob.space.npts)
    y_ser = prob.A.dot(StencilVector.from_interior(prob.space, x_int))
    y_dist = _sharded_spmv(prob.space, prob.A.band_t, x_int, mesh_shape)
    np.testing.assert_allclose(y_dist, np.asarray(y_ser.interior),
                               rtol=1e-13, atol=1e-13)


def test_dist_spmv_periodic_wrap():
    """Periodic dims use wrapping ppermute; compare vs serial wrap."""
    from tests.test_stencil import random_stencil
    space, A = random_stencil((16,), (2,), (True,), seed=11)
    x_int = np.random.default_rng(1).standard_normal(space.npts)
    y_ser = A.dot(StencilVector.from_interior(space, x_int))
    y_dist = _sharded_spmv(space, A.band_t, x_int, (8,))
    np.testing.assert_allclose(y_dist, np.asarray(y_ser.interior),
                               rtol=1e-13, atol=1e-13)


def test_halo_exchange_unit():
    """Ghosts after exchange == neighbor interior slabs (1D, 4 devices)."""
    names = ("ax0",)
    mesh = jax.make_mesh((4,), names)
    spec = HaloSpec.build(names, (4,), (4,), (2,), (False,))
    x = jnp.arange(16.0)

    f = jax.shard_map(lambda xl: pad_and_exchange(xl, spec), mesh=mesh,
                      in_specs=P("ax0"), out_specs=P("ax0"))
    out = np.asarray(jax.jit(f)(x)).reshape(4, 8)
    # device 1 holds [4..8); its left ghosts must be [2,3], right [8,9]
    np.testing.assert_allclose(out[1], [2, 3, 4, 5, 6, 7, 8, 9])
    # edge devices get Dirichlet zeros
    np.testing.assert_allclose(out[0][:2], [0, 0])
    np.testing.assert_allclose(out[3][-2:], [0, 0])


@pytest.mark.parametrize("smoother,omega", [("jacobi", 2 / 3), ("rbgs", 1.0)])
@pytest.mark.parametrize("dim,n_el,mesh_shape", [
    (1, 64, (8,)),
    (2, 16, (4, 2)),
])
def test_dist_solve_matches_serial(dim, n_el, mesh_shape, smoother, omega):
    prob = poisson_problem(dim, n_el, degree=3)
    cfg = CycleConfig(smoother=SmootherConfig(kind=smoother, omega=omega))
    serial = MultigridSolver(prob, num_levels=2, cfg=cfg)
    res_s = serial.solve(tol=1e-10, maxiter=60)
    dist = DistributedMG(prob, num_levels=2, mesh_shape=mesh_shape, cfg=cfg)
    res_d = dist.solve(tol=1e-10, maxiter=60)
    assert res_d.converged
    assert res_d.iterations == res_s.iterations
    np.testing.assert_allclose(res_d.residuals, res_s.residuals,
                               rtol=1e-6, atol=1e-13)
    np.testing.assert_allclose(np.asarray(res_d.x.interior),
                               np.asarray(res_s.x.interior),
                               rtol=1e-8, atol=1e-12)


def test_dist_3d_multilevel():
    prob = poisson_problem(3, 8, degree=2)
    cfg = CycleConfig(smoother=SmootherConfig(kind="jacobi", omega=0.7))
    serial = MultigridSolver(prob, num_levels=3, cfg=cfg)
    res_s = serial.solve(tol=1e-8, maxiter=60)
    dist = DistributedMG(prob, num_levels=3, mesh_shape=(2, 2, 2), cfg=cfg)
    res_d = dist.solve(tol=1e-8, maxiter=60)
    assert res_d.converged and res_d.iterations == res_s.iterations
    np.testing.assert_allclose(res_d.residuals, res_s.residuals,
                               rtol=1e-6, atol=1e-13)


def test_dist_rejects_gs_lex():
    prob = poisson_problem(1, 16, degree=2)
    with pytest.raises(ValueError, match="not distributed"):
        DistributedMG(prob, num_levels=2, mesh_shape=(4,),
                      cfg=CycleConfig(smoother=SmootherConfig("gs_lex")))


@pytest.mark.parametrize("dim,n_el,mesh_shape,levels", [
    (1, 128, (4,), 3),
    (2, 32, (2, 2), 3),
    (2, 64, (4, 2), 4),
])
def test_multilevel_distributed_transfers(dim, n_el, mesh_shape, levels):
    """Grids big enough that >= 2 levels stay sharded: the distributed
    per-axis transfer path must reproduce the serial solver exactly."""
    prob = poisson_problem(dim, n_el, degree=2)
    cfg = CycleConfig(smoother=SmootherConfig(kind="jacobi", omega=0.7))
    dist = DistributedMG(prob, num_levels=levels, mesh_shape=mesh_shape,
                         cfg=cfg)
    assert dist.L_dist >= 2, "test intends to exercise distributed transfers"
    serial = MultigridSolver(prob, num_levels=levels, cfg=cfg)
    res_s = serial.solve(tol=1e-9, maxiter=50)
    res_d = dist.solve(tol=1e-9, maxiter=50)
    assert res_d.converged and res_d.iterations == res_s.iterations
    np.testing.assert_allclose(res_d.residuals, res_s.residuals,
                               rtol=1e-6, atol=1e-13)
    np.testing.assert_allclose(np.asarray(res_d.x.interior),
                               np.asarray(res_s.x.interior),
                               rtol=1e-8, atol=1e-12)


def test_multilevel_dist_rbgs():
    prob = poisson_problem(2, 32, degree=2)
    cfg = CycleConfig(smoother=SmootherConfig(kind="rbgs", omega=1.0))
    dist = DistributedMG(prob, num_levels=3, mesh_shape=(4, 2), cfg=cfg)
    assert dist.L_dist >= 2
    serial = MultigridSolver(prob, num_levels=3, cfg=cfg)
    res_s = serial.solve(tol=1e-9, maxiter=60)
    res_d = dist.solve(tol=1e-9, maxiter=60)
    assert res_d.iterations == res_s.iterations
    np.testing.assert_allclose(res_d.residuals, res_s.residuals,
                               rtol=1e-6, atol=1e-13)


@pytest.mark.slow
def test_dist_chebyshev_and_wcycle_match_serial():
    prob = poisson_problem(2, 32, degree=3)
    cfg = CycleConfig(nu1=1, nu2=1, gamma=2,
                      smoother=SmootherConfig(kind="chebyshev",
                                              cheb_fraction=16.0))
    serial = MultigridSolver(prob, num_levels=3, cfg=cfg)
    res_s = serial.solve(tol=1e-9, maxiter=40)
    dist = DistributedMG(prob, num_levels=3, mesh_shape=(2, 2), cfg=cfg)
    res_d = dist.solve(tol=1e-9, maxiter=40)
    assert res_d.converged and res_d.iterations == res_s.iterations
    np.testing.assert_allclose(res_d.residuals, res_s.residuals,
                               rtol=1e-6, atol=1e-13)


@pytest.mark.parametrize("smoother,omega,dim,n_el,mesh_shape,levels", [
    ("jacobi", 0.7, 2, 32, (4, 2), 3),
    ("rbgs", 1.0, 2, 16, (2, 2), 2),
    ("rbgs", 1.0, 3, 8, (2, 2, 2), 2),
])
def test_dist_mixed_matches_serial_mixed(smoother, omega, dim, n_el,
                                         mesh_shape, levels):
    """Sharded defect correction ≡ serial MixedPrecisionMG: same iteration
    count to 1e-10 and matching residual histories (VERDICT.md #3).  The
    f32 cycle rounds per-device summation differently, so histories match
    to f32-level relative tolerance, and the final f64 residual is checked
    independently."""
    from poms_tpu.mg.mixed import MixedPrecisionMG

    prob = poisson_problem(dim, n_el, degree=2)
    cfg = CycleConfig(smoother=SmootherConfig(kind=smoother, omega=omega))
    serial = MixedPrecisionMG(prob, num_levels=levels, cfg=cfg)
    res_s = serial.solve(tol=1e-10, maxiter=80)
    # overlap=False: the step-for-step history claim needs the same f32
    # summation order as the serial path (the default overlap formulation
    # is equivalent in f64 but reorders f32 ops; its own equivalence test
    # is test_overlap_spmv_equivalence)
    dist = DistributedMG(prob, num_levels=levels, mesh_shape=mesh_shape,
                         cfg=cfg, mixed=True, overlap=False)
    res_d = dist.solve(tol=1e-10, maxiter=80)
    assert res_s.converged and res_d.converged
    assert abs(res_d.iterations - res_s.iterations) <= 1
    n = min(len(res_s.residuals), len(res_d.residuals))
    np.testing.assert_allclose(res_d.residuals[:n], res_s.residuals[:n],
                               rtol=2e-4, atol=1e-12)
    r = prob.b - prob.A.dot(res_d.x)
    assert float(r.norm()) <= 2e-10


def test_overlap_spmv_equivalence():
    """Interior + disjoint-shell-correction SpMV == plain exchanged SpMV."""
    from poms_tpu.parallel.halo import HaloSpec as HS, dist_spmv as dsp
    prob = poisson_problem(2, 16, degree=3)
    x_int = np.random.default_rng(3).standard_normal(prob.space.npts)
    y_plain = _sharded_spmv(prob.space, prob.A.band_t, x_int, (4, 2))

    d = prob.space.ndim
    names = tuple(f"ax{a}" for a in range(d))
    mesh = jax.make_mesh((4, 2), names)
    npts = prob.space.npts
    N = tuple(-(-npts[a] // (4, 2)[a]) * (4, 2)[a] for a in range(d))
    n_loc = tuple(N[a] // (4, 2)[a] for a in range(d))
    spec = HS.build(names, (4, 2), n_loc, prob.space.pads,
                    prob.space.periodic)
    band_pad = jnp.asarray(_pad_band_identity(
        np.asarray(prob.A.band_t), npts, N, prob.space.pads))
    x_pad = jnp.pad(jnp.asarray(x_int),
                    [(0, N[a] - npts[a]) for a in range(d)])
    f = jax.shard_map(lambda bl, xl: dsp(bl, xl, spec, True), mesh=mesh,
                      in_specs=(P(*((None,) * d + names)), P(*names)),
                      out_specs=P(*names))
    y = np.asarray(jax.jit(f)(band_pad, x_pad))[
        tuple(slice(0, n) for n in npts)]
    np.testing.assert_allclose(y, y_plain, rtol=1e-12, atol=1e-13)


def test_overlap_solve_matches_plain():
    prob = poisson_problem(2, 32, degree=2)
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig("chebyshev",
                                              cheb_fraction=16.0))
    plain = DistributedMG(prob, num_levels=3, mesh_shape=(2, 2), cfg=cfg)
    over = DistributedMG(prob, num_levels=3, mesh_shape=(2, 2), cfg=cfg,
                         overlap=True)
    r1 = plain.solve(tol=1e-9, maxiter=40)
    r2 = over.solve(tol=1e-9, maxiter=40)
    assert r2.converged and r2.iterations == r1.iterations
    np.testing.assert_allclose(r2.residuals, r1.residuals, rtol=1e-6,
                               atol=1e-14)


class TestDistLevelsAutoBoundary:
    """Pin the ``dist_levels='auto'`` agglomeration-depth heuristic
    (parallel/dist.py: the ``n_loc_coarse < p + 2`` guard — VERDICT r2
    weak #6 asked for exactly this edge coverage).

    1D, degree 2 → npts = n_el, and the guard needs p + 2 = 4 local
    points on the coarsest *distributed* level.  Hand-derived depths:

      n_el=32, mesh (8,): level-1 padded size 16 → 2 points/device < 4,
                          so only the finest level distributes (L=1).
      n_el=32, mesh (4,): level-1 gives 4/device (== p+2, boundary
                          inclusive) but level-2 gives 2 → L=2.
      n_el=32, mesh (2,): 4/device at level 2 → L=3 (= num_levels-1 cap).
      n_el=40, mesh (4,): level-2 pads 10 → 12 → 3/device < 4 → L=2
                          (padding participates in the bound).
    """

    def _mg(self, n_el, mesh_shape, dist_levels="auto"):
        prob = poisson_problem(1, n_el, degree=2)
        return DistributedMG(prob, num_levels=4, mesh_shape=mesh_shape,
                             dist_levels=dist_levels)

    @pytest.mark.parametrize("n_el,mesh_shape,expect", [
        (32, (8,), 1),
        (32, (4,), 2),
        (32, (2,), 3),
        (40, (4,), 2),
    ])
    def test_auto_depth(self, n_el, mesh_shape, expect):
        assert self._mg(n_el, mesh_shape).L_dist == expect

    def test_explicit_request_is_clamped_by_guard(self):
        # asking for 3 distributed levels on the (8,) mesh must still stop
        # at 1: the guard protects transfer-halo validity, not preference
        assert self._mg(32, (8,), dist_levels=3).L_dist == 1

    def test_solve_at_the_boundary_matches_serial(self):
        # n_loc_coarse == p + 2 exactly (the inclusive edge): solve must
        # still agree with the serial path
        prob = poisson_problem(1, 32, degree=2)
        mg = DistributedMG(prob, num_levels=4, mesh_shape=(4,))
        assert mg.L_dist == 2
        res = mg.solve(tol=1e-11, maxiter=40)
        ser = MultigridSolver(prob, num_levels=4).solve(tol=1e-11,
                                                        maxiter=40)
        assert res.converged and ser.converged
        np.testing.assert_allclose(np.asarray(res.x.interior),
                                   np.asarray(ser.x.interior),
                                   rtol=1e-9, atol=1e-11)
