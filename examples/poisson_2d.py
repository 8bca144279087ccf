"""Config-2 driver: 2D Poisson, full V-cycle hierarchy with Galerkin RAP.

Run:  python examples/poisson_2d.py [n_el] [degree] [levels] [cycle: v|w|fmg]
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


def main(n_el=64, degree=3, levels=4, kind="v"):
    prob = poisson_problem(2, n_el, degree=degree)
    cfg = CycleConfig(gamma=2 if kind == "w" else 1,
                      smoother=SmootherConfig(kind="jacobi", omega=0.8))
    mg = MultigridSolver(prob, num_levels=levels, cfg=cfg)
    res = mg.solve(tol=1e-10, maxiter=100, use_fmg=(kind == "fmg"))
    for i, r in enumerate(res.residuals):
        print(f"cycle {i:3d}  ||r|| = {r:.6e}")
    print(f"{kind}-cycle converged={res.converged} in {res.iterations}; "
          f"L2 err = {l2_error_manufactured(prob, res.x):.3e}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*([int(x) for x in a[:3]] + a[3:4]))
