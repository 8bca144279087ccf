"""Distributed Kronecker-sum operator + periodic solve + FMG
(VERDICT r2 asks #7 and #8): sharded ≡ serial to f64 roundoff.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poms_tpu.core.kron import KroneckerSumOperator
from poms_tpu.core.space import StencilVectorSpace
from poms_tpu.core.vector import StencilVector
from poms_tpu.mg.cycles import CycleConfig
from poms_tpu.mg.smoother import SmootherConfig
from poms_tpu.mg.solver import MultigridSolver
from poms_tpu.models.periodic import periodic_problem
from poms_tpu.models.poisson import poisson_problem
from poms_tpu.parallel.dist import DistributedMG
from poms_tpu.parallel.halo import HaloSpec
from poms_tpu.parallel.kron import (dist_kron_apply, dist_kron_diag,
                                    pad_band_1d_identity)


def _random_kron(npts, p, periodic=False, seed=0):
    d = len(npts)
    rng = np.random.default_rng(seed)
    space = StencilVectorSpace(npts=npts, pads=(p,) * d,
                               periodic=periodic, dtype=jnp.float64)
    Ks = [jnp.asarray(rng.standard_normal((n, 2 * p + 1))) for n in npts]
    Ms = [jnp.asarray(rng.standard_normal((n, 2 * p + 1))) for n in npts]
    terms = [[Ks[b] if b == a else Ms[b] for b in range(d)]
             for a in range(d)]
    return KroneckerSumOperator(space, terms)


@pytest.mark.parametrize("periodic", [False, True])
def test_dist_kron_apply_matches_serial(periodic):
    npts, p = (16, 8), 2
    mesh_shape = (4, 2)
    A = _random_kron(npts, p, periodic=periodic)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(npts)
    y_ref = np.asarray(A.dot(
        StencilVector.from_interior(A.space, jnp.asarray(x))).interior)

    names = ("ax0", "ax1")
    mesh = jax.make_mesh(mesh_shape, names)
    n_loc = tuple(npts[a] // mesh_shape[a] for a in range(2))
    spec = HaloSpec.build(names, mesh_shape, n_loc, (p, p),
                          (periodic, periodic))
    labels = A._band_labels()
    by_axis = []
    for a in range(2):
        distinct = [None] * (max(labels[a]) + 1)
        for r, term in enumerate(A.terms):
            distinct[labels[a][r]] = term[a]
        by_axis.append(tuple(jnp.asarray(B) for B in distinct))
    bands = tuple(by_axis)

    from jax.sharding import PartitionSpec as P

    f = jax.jit(jax.shard_map(
        lambda bl, xl: (dist_kron_apply(bl, labels, xl, spec),
                        dist_kron_diag(bl, labels, spec)),
        mesh=mesh, in_specs=(P(), P(*names)),
        out_specs=(P(*names), P(*names))))
    y, diag = f(bands, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-13, atol=1e-12)
    np.testing.assert_allclose(np.asarray(diag), np.asarray(A.diagonal()),
                               rtol=1e-13, atol=1e-14)


def test_pad_band_1d_identity():
    B = np.arange(12.0).reshape(4, 3)
    Bp = pad_band_1d_identity(B, 6)
    assert Bp.shape == (6, 3)
    np.testing.assert_array_equal(Bp[:4], B)
    np.testing.assert_array_equal(Bp[4:], [[0, 1, 0], [0, 1, 0]])


@pytest.mark.parametrize("smoother", ["jacobi", "rbgs", "chebyshev"])
def test_dist_kron_solve_matches_serial(smoother):
    """DistributedMG(operator='kron') residual history ≡ serial kron MG."""
    prob = poisson_problem(2, 16, degree=2, operator="kron")
    kw = ({"cheb_fraction": 16.0} if smoother == "chebyshev"
          else {"omega": 0.8 if smoother == "jacobi" else 1.0})
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig(kind=smoother, **kw))
    serial = MultigridSolver(prob, num_levels=2, cfg=cfg, operator="kron")
    res_s = serial.solve(tol=1e-10, maxiter=12)
    dist = DistributedMG(prob, num_levels=2, mesh_shape=(2, 2), cfg=cfg,
                         operator="kron")
    res_d = dist.solve(tol=1e-10, maxiter=12)
    for a, b in zip(res_s.residuals, res_d.residuals):
        assert abs(a - b) <= 1e-10 * max(1.0, a), (a, b)


def test_dist_kron_3d_matches_serial():
    """3D kron dist cycles ≡ serial on an 8-device mesh (this 2-level
    nu=1 cycle converges slowly by design — parity is the property)."""
    prob = poisson_problem(3, 8, degree=2, operator="kron")
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig(kind="rbgs", omega=1.0))
    serial = MultigridSolver(prob, num_levels=2, cfg=cfg, operator="kron")
    res_s = serial.solve(tol=1e-10, maxiter=8)
    dist = DistributedMG(prob, num_levels=2, mesh_shape=(2, 2, 2), cfg=cfg,
                         operator="kron")
    res_d = dist.solve(tol=1e-10, maxiter=8)
    for a, b in zip(res_s.residuals, res_d.residuals):
        assert abs(a - b) <= 1e-12 * max(1.0, a), (a, b)
    assert res_d.residuals[-1] < 1e-2 * res_d.residuals[0]


def test_dist_kron_mixed_solve():
    """Sharded mixed-precision defect correction over the kron operator."""
    prob = poisson_problem(2, 16, degree=2, operator="kron",
                           dtype=jnp.float64)
    cfg = CycleConfig(nu1=2, nu2=2,
                      smoother=SmootherConfig(kind="rbgs", omega=1.0))
    dist = DistributedMG(prob, num_levels=2, mesh_shape=(2, 2), cfg=cfg,
                         operator="kron", mixed=True)
    res = dist.solve(tol=1e-10, maxiter=60)
    assert res.converged, res.residuals[-3:]
    r = prob.b - prob.A.dot(res.x)
    assert float(r.norm()) <= 2e-10


def test_dist_kron_mixed_twofloat():
    """Sharded twofloat defect correction (dw-f32 residual, psum'd dw
    norm) reaches 1e-10 and tracks the f64-residual dist path."""
    prob = poisson_problem(2, 16, degree=2, operator="kron",
                           dtype=jnp.float64)
    cfg = CycleConfig(nu1=2, nu2=2,
                      smoother=SmootherConfig(kind="rbgs", omega=1.0))
    tf = DistributedMG(prob, num_levels=2, mesh_shape=(2, 2), cfg=cfg,
                       operator="kron", mixed=True,
                       mixed_residual="twofloat")
    assert tf.mixed_residual == "twofloat"
    res_tf = tf.solve(tol=1e-10, maxiter=60)
    assert res_tf.converged, res_tf.residuals[-3:]
    r = prob.b - prob.A.dot(res_tf.x)
    assert float(r.norm()) <= 2e-10
    f64 = DistributedMG(prob, num_levels=2, mesh_shape=(2, 2), cfg=cfg,
                        operator="kron", mixed=True, mixed_residual="f64")
    res_64 = f64.solve(tol=1e-10, maxiter=60)
    for a, b in zip(res_64.residuals[:6], res_tf.residuals[:6]):
        assert abs(a - b) / max(a, 1e-30) < 0.05, (a, b)


def test_dist_mixed_residual_guard():
    prob = poisson_problem(2, 16, degree=2, dtype=jnp.float64)
    with pytest.raises(ValueError, match="twofloat"):
        DistributedMG(prob, num_levels=2, mesh_shape=(2, 2), mixed=True,
                      mixed_residual="twofloat")   # banded operator


@pytest.mark.parametrize("operator", ["banded", "kron"])
def test_dist_periodic_solve(operator):
    """Distributed periodic solve, both operator formats (ask #8)."""
    prob = periodic_problem(2, 16, degree=2, shift=1.0)
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig(kind="jacobi", omega=0.8))
    dist = DistributedMG(prob, num_levels=2, mesh_shape=(2, 2), cfg=cfg,
                         operator=operator)
    res = dist.solve(tol=1e-10, maxiter=60)
    assert res.converged, res.residuals[-3:]
    r = prob.b - prob.A.dot(res.x)
    assert float(r.norm()) <= 5e-10


def test_dist_periodic_padding_rejected():
    """Periodic dims that would need grid padding raise a clear error."""
    prob = periodic_problem(2, 12, degree=2, shift=1.0)  # 12 % 8 != 0
    with pytest.raises(ValueError, match="periodic dim"):
        DistributedMG(prob, num_levels=2, mesh_shape=(8, 1),
                      cfg=CycleConfig(smoother=SmootherConfig("jacobi", 0.8)))


def test_dist_fmg_matches_serial():
    """Distributed FMG start ≡ serial FMG start (residual after FMG),
    and FMG accelerates the solve."""
    prob = poisson_problem(2, 32, degree=2)
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig(kind="jacobi", omega=0.8))
    serial = MultigridSolver(prob, num_levels=3, cfg=cfg)
    res_s = serial.solve(tol=1e-10, maxiter=40, use_fmg=True)
    dist = DistributedMG(prob, num_levels=3, mesh_shape=(2, 2), cfg=cfg)
    res_d = dist.solve(tol=1e-10, maxiter=40, use_fmg=True)
    assert res_d.converged
    # identical nested iteration → identical residual histories
    for a, b in zip(res_s.residuals, res_d.residuals):
        assert abs(a - b) <= 1e-9 * max(1.0, a), (a, b)
    plain = dist.solve(tol=1e-10, maxiter=40, use_fmg=False)
    # the FMG start lands far below the zero start (‖b‖)
    assert res_d.residuals[0] < 1e-2 * plain.residuals[0]


def test_dist_fmg_kron():
    prob = poisson_problem(2, 16, degree=2, operator="kron")
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig(kind="jacobi", omega=0.8))
    dist = DistributedMG(prob, num_levels=2, mesh_shape=(2, 2), cfg=cfg,
                         operator="kron")
    res = dist.solve(tol=1e-10, maxiter=40, use_fmg=True)
    assert res.converged


def test_dist_solve_compiled_matches_host_loop():
    """DistributedMG.solve_compiled (lax.while_loop around the shard_map
    step) ≡ solve (host loop) for the plain and the mixed-twofloat
    configurations (VERDICT r3 ask #4)."""
    cfg = CycleConfig(nu1=2, nu2=2,
                      smoother=SmootherConfig(kind="jacobi", omega=0.8))
    prob = poisson_problem(2, 16, degree=2, operator="kron")
    dist = DistributedMG(prob, num_levels=2, mesh_shape=(2, 2), cfg=cfg,
                         operator="kron")
    res = dist.solve(tol=1e-10, maxiter=60)
    assert res.converged
    x, rn, it = dist.solve_compiled(tol=1e-10, maxiter=60)
    assert int(it) == res.iterations
    assert float(rn) <= 1e-10
    np.testing.assert_allclose(np.asarray(x.interior),
                               np.asarray(res.x.interior),
                               rtol=0, atol=1e-13)


def test_dist_solve_compiled_twofloat():
    cfg = CycleConfig(nu1=2, nu2=2,
                      smoother=SmootherConfig(kind="rbgs", omega=1.0))
    prob = poisson_problem(2, 16, degree=2, operator="kron",
                           dtype=jnp.float64)
    dist = DistributedMG(prob, num_levels=2, mesh_shape=(2, 2), cfg=cfg,
                         operator="kron", mixed=True,
                         mixed_residual="twofloat")
    res = dist.solve(tol=1e-10, maxiter=60)
    assert res.converged
    x, rn, it = dist.solve_compiled(tol=1e-10, maxiter=60)
    assert int(it) == res.iterations
    assert float(rn) <= 1e-10
    np.testing.assert_allclose(np.asarray(x.interior),
                               np.asarray(res.x.interior),
                               rtol=0, atol=1e-13)


def test_dist_kron_fused_exchange_fewer_collectives():
    """The fused-exchange apply (VERDICT r3 ask #8): bit-identical output
    to the per-axis-exchange form AND visibly fewer ppermutes in the
    jaxpr (3D Poisson sharing: 1 exchange round instead of 5)."""
    npts, p = (16, 8), 2
    mesh_shape = (4, 2)
    A = _random_kron(npts, p)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(npts))
    names = ("ax0", "ax1")
    mesh = jax.make_mesh(mesh_shape, names)
    n_loc = tuple(npts[a] // mesh_shape[a] for a in range(2))
    spec = HaloSpec.build(names, mesh_shape, n_loc, (p, p), (False, False))
    labels = A._band_labels()
    by_axis = []
    for a in range(2):
        distinct = [None] * (max(labels[a]) + 1)
        for r, term in enumerate(A.terms):
            distinct[labels[a][r]] = term[a]
        by_axis.append(tuple(jnp.asarray(B) for B in distinct))
    bands = tuple(by_axis)

    from jax.sharding import PartitionSpec as P

    def count_ppermutes(fused):
        fn = jax.shard_map(
            lambda bl, xl: dist_kron_apply(bl, labels, xl, spec,
                                           fused=fused),
            mesh=mesh, in_specs=(P(), P(*names)), out_specs=P(*names))
        jaxpr = str(jax.make_jaxpr(fn)(bands, x))
        return jaxpr.count("ppermute")

    f_fused = jax.jit(jax.shard_map(
        lambda bl, xl: dist_kron_apply(bl, labels, xl, spec, fused=True),
        mesh=mesh, in_specs=(P(), P(*names)), out_specs=P(*names)))
    f_sep = jax.jit(jax.shard_map(
        lambda bl, xl: dist_kron_apply(bl, labels, xl, spec, fused=False),
        mesh=mesh, in_specs=(P(), P(*names)), out_specs=P(*names)))
    y_f = np.asarray(f_fused(bands, x))
    y_s = np.asarray(f_sep(bands, x))
    np.testing.assert_array_equal(y_f, y_s)
    n_f, n_s = count_ppermutes(True), count_ppermutes(False)
    # 2D with sharing: fused = 1 round (2 ppermute pairs); per-axis =
    # 1 + 2 partial exchanges (each with its pair)
    assert n_f < n_s, (n_f, n_s)
    assert n_f == 4  # 2 dims x (fwd + bwd)


def test_dist_inner_cycles_matches_serial():
    """Sharded inner_cycles=2 defect correction ≡ serial MixedPrecisionMG
    with the same knob (residual histories match to dw roundoff)."""
    from poms_tpu.mg.mixed import MixedPrecisionMG

    prob = poisson_problem(2, 16, degree=2, operator="kron",
                           dtype=jnp.float64)
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig(kind="jacobi", omega=0.8))
    ser = MixedPrecisionMG(prob, num_levels=2, cfg=cfg, operator="kron",
                           residual="twofloat", inner_cycles=2)
    res_s = ser.solve(tol=1e-10, maxiter=40)
    dist = DistributedMG(prob, num_levels=2, mesh_shape=(2, 2), cfg=cfg,
                         operator="kron", mixed=True,
                         mixed_residual="twofloat", inner_cycles=2)
    res_d = dist.solve(tol=1e-10, maxiter=40)
    assert res_s.converged and res_d.converged
    assert res_s.iterations == res_d.iterations
    r0 = res_s.residuals[0]
    for a, b in zip(res_s.residuals[1:], res_d.residuals[1:]):
        # dw-f32 path: serial and sharded sum in different orders; the
        # residual ENTRIES carry an absolute dw floor ~2^-49·‖b‖, so small
        # residuals differ by that floor, not by a relative factor
        assert abs(a - b) <= 1e-6 * a + 1e-13 * r0, (a, b)
