"""Aux subsystems: structured logging + checkpoint/resume (SURVEY.md §5)."""
import io
import json
import os

import numpy as np

from poms_tpu.mg.cycles import CycleConfig
from poms_tpu.mg.smoother import SmootherConfig
from poms_tpu.mg.solver import MultigridSolver
from poms_tpu.models.poisson import poisson_problem
from poms_tpu.utils.checkpoint import load_solver_state, save_solver_state
from poms_tpu.utils.logging import ConvergenceLogger


def test_convergence_logger_json_lines():
    buf = io.StringIO()
    prob = poisson_problem(1, 16, degree=2)
    mg = MultigridSolver(prob, num_levels=2,
                         cfg=CycleConfig(smoother=SmootherConfig("jacobi")))
    with ConvergenceLogger(stream=buf, meta={"dim": 1}) as log:
        res = mg.solve(tol=1e-10, maxiter=40, logger=log)
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert lines[0]["event"] == "start" and lines[0]["dim"] == 1
    cyc = [l for l in lines if l["event"] == "cycle"]
    assert len(cyc) == res.iterations
    assert cyc[-1]["residual"] == res.residuals[-1]
    assert all("rho" in l and "wall_s" in l for l in cyc)


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "state.npz")
    x = np.random.default_rng(0).standard_normal((5, 7))
    save_solver_state(path, x, [1.0, 0.1, 0.01], 3, meta={"dim": 2, "p": 3})
    x2, hist, it, meta = load_solver_state(path)
    np.testing.assert_array_equal(x, x2)
    assert hist == [1.0, 0.1, 0.01] and it == 3
    assert meta == {"dim": 2, "p": 3}


def test_checkpoint_resume_continues_solve(tmp_path):
    """Interrupt after k cycles, resume from checkpoint: same final history."""
    from poms_tpu.core.vector import StencilVector

    prob = poisson_problem(2, 16, degree=2)
    cfg = CycleConfig(smoother=SmootherConfig("jacobi", 0.8))
    mg = MultigridSolver(prob, num_levels=2, cfg=cfg)
    full = mg.solve(tol=1e-10, maxiter=40)

    part = mg.solve(tol=1e-10, maxiter=4)
    path = str(tmp_path / "ck.npz")
    save_solver_state(path, np.asarray(part.x.interior), part.residuals,
                      part.iterations)
    x_in, hist, it, _ = load_solver_state(path)
    x0 = StencilVector.from_interior(prob.space, x_in)
    rest = mg.solve(tol=1e-10, maxiter=40 - it, x0=x0)
    combined = hist + rest.residuals[1:]
    np.testing.assert_allclose(combined, full.residuals, rtol=1e-10)
