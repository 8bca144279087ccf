"""Lane-folded small-lane 3D SpMV (ops/spmv.py fold2 — VERDICT r4 #3).

The fold is pure XLA (reshape-folded band + phase-view shifted MACs) so
the parity tier runs everywhere; measured on chip: 0.631 ms = 70.0% SoL
at 64³ p3 f32 vs 13.9% (Pallas v1) / 12.1% (plain jnp).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from poms_tpu.ops.spmv import (fold2_band, spmv_banded_fold2_jnp,
                               spmv_banded_jnp)

CASES = [
    ((6, 8, 10), 1), ((6, 9, 10), 1),      # even + odd n2
    ((6, 7, 10), 2), ((8, 17, 10), 3),     # odd n2, p2 > 1
    ((8, 64, 64), 3), ((8, 65, 64), 3),    # the 64³-class lane widths
    ((5, 4, 7), 3), ((5, 5, 7), 3),        # tiny ragged
]


@pytest.mark.parametrize("npts,p", CASES)
def test_fold2_matches_jnp_exactly(npts, p):
    pads = (p,) * 3
    w = tuple(2 * p + 1 for _ in range(3))
    rng = np.random.default_rng(3)
    band = jnp.asarray(rng.standard_normal(w + npts), jnp.float32)
    xp = jnp.asarray(rng.standard_normal(tuple(n + 2 * p for n in npts)),
                     jnp.float32)
    ref = spmv_banded_jnp(band, xp, npts, pads)
    out = spmv_banded_fold2_jnp(fold2_band(band, npts), xp, npts, pads)
    # identical MAC order → bitwise-equal results
    assert float(jnp.max(jnp.abs(out - ref))) == 0.0


def test_fold2_dispatch_gates(monkeypatch):
    from poms_tpu.ops import dispatch as _d

    monkeypatch.delenv("POMS_TPU_FOLD2", raising=False)
    dummy = object()
    # no folded band → never
    assert not _d.use_fold2(jnp.float32, (64, 64, 64), None)
    # folded band present → small-lane 3D only
    assert _d.use_fold2(jnp.float32, (64, 64, 64), dummy)
    assert _d.use_fold2(jnp.float32, (64, 65, 64), dummy)
    assert not _d.use_fold2(jnp.float32, (128, 128, 128), dummy)  # lanes ok
    assert not _d.use_fold2(jnp.float32, (64, 64), dummy)         # 2D
    assert not _d.use_fold2(jnp.float64, (64, 64, 64), dummy)     # f64
    monkeypatch.setenv("POMS_TPU_FOLD2", "0")
    assert not _d.use_fold2(jnp.float32, (64, 64, 64), dummy)


def test_fold2_solver_equivalence(monkeypatch):
    """Forced-fold MG solve matches the unfolded path (rbgs: identical
    config, so histories agree to f32 reduce-order noise)."""
    monkeypatch.setenv("POMS_TPU_FOLD2", "1")
    from poms_tpu.mg.cycles import CycleConfig
    from poms_tpu.mg.smoother import SmootherConfig
    from poms_tpu.mg.solver import MultigridSolver
    from poms_tpu.models.poisson import poisson_problem

    prob = poisson_problem(3, 16, degree=3, dtype=jnp.float32)
    cfg = CycleConfig(nu1=2, nu2=2, smoother=SmootherConfig("rbgs", 1.0))
    mg = MultigridSolver(prob, num_levels=2, cfg=cfg)
    assert mg.levels[0].A.folded2 is not None
    res = mg.solve(tol=1e-5, maxiter=30)
    monkeypatch.setenv("POMS_TPU_FOLD2", "0")
    # fresh problem: the setup hooks mutate problem.A in place (the
    # pre-fold rides the operator, ensure_packed_v2-style)
    prob = poisson_problem(3, 16, degree=3, dtype=jnp.float32)
    mg2 = MultigridSolver(prob, num_levels=2, cfg=cfg)
    assert mg2.levels[0].A.folded2 is None
    res2 = mg2.solve(tol=1e-5, maxiter=30)
    a = np.array(res.residuals)
    b = np.array(res2.residuals)
    m = min(len(a), len(b))
    assert np.abs(a[:m] - b[:m]).max() <= 1e-6 * b[0]
