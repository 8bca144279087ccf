"""Config-1 driver: 1D Poisson, cubic B-splines, 2-grid, weighted Jacobi.

Mirrors the reference's smallest example (BASELINE.json config 1).
Run:  python examples/poisson_1d.py [n_el]
"""
import sys

import jax

# the configs below build f64 problems; without x64 every "f64" buffer
# silently truncates to f32 and the residual stalls at ~1e-6 (the exact
# failure mode guarded in parallel/dist.py)
jax.config.update("jax_enable_x64", True)

from poms_tpu.mg.cycles import CycleConfig
from poms_tpu.mg.smoother import SmootherConfig
from poms_tpu.mg.solver import MultigridSolver
from poms_tpu.models.poisson import l2_error_manufactured, poisson_problem


def main(n_el=64):
    prob = poisson_problem(1, n_el, degree=3)
    cfg = CycleConfig(smoother=SmootherConfig(kind="jacobi", omega=2 / 3))
    mg = MultigridSolver(prob, num_levels=2, cfg=cfg)
    res = mg.solve(tol=1e-10, maxiter=60)
    for i, r in enumerate(res.residuals):
        print(f"cycle {i:3d}  ||r|| = {r:.6e}")
    print(f"converged={res.converged}; L2 error = "
          f"{l2_error_manufactured(prob, res.x, pts_per_dim=512):.3e}")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:2]])
