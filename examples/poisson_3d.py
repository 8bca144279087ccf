"""Config-3 driver: 3D Poisson, red-black Gauss-Seidel, direct coarse solve.

Mirrors the reference's 3D example driver (SURVEY.md §2 C14, BASELINE.json
config 3): assemble, solve to ‖r‖ ≤ 1e-10, print the residual history and
the L2 error against the manufactured solution.

Run:  python examples/poisson_3d.py [n_el] [degree] [levels]
"""
import sys

import jax

# the configs below build f64 problems; without x64 every "f64" buffer
# silently truncates to f32 and the residual stalls at ~1e-6 (the exact
# failure mode guarded in parallel/dist.py)
jax.config.update("jax_enable_x64", True)

import numpy as np

from poms_tpu.mg.cycles import CycleConfig
from poms_tpu.mg.smoother import SmootherConfig
from poms_tpu.mg.solver import MultigridSolver
from poms_tpu.models.poisson import l2_error_manufactured, poisson_problem
from poms_tpu.utils.logging import ConvergenceLogger


def main(n_el=16, degree=3, levels=3):
    print(f"3D Poisson: n_el={n_el}^3, degree={degree}, {levels} levels, "
          f"RB-GS smoother")
    prob = poisson_problem(3, n_el, degree=degree)
    cfg = CycleConfig(nu1=2, nu2=2,
                      smoother=SmootherConfig(kind="rbgs", omega=1.0))
    mg = MultigridSolver(prob, num_levels=levels, cfg=cfg)
    with ConvergenceLogger(meta={"config": 3, "n_el": n_el,
                                 "degree": degree}) as log:
        res = mg.solve(tol=1e-6, maxiter=60, logger=log)
    print(f"plain RB-GS V-cycles: |r| {res.residuals[-1]:.3e} after "
          f"{res.iterations} cycles (rho ~ "
          f"{np.median(res.convergence_factors):.2f} — the documented "
          f"high-degree B-spline pathology: small-eigenvalue oscillatory "
          f"modes stall plain cycles of ANY pointwise smoother at p >= 3; "
          f"SURVEY.md 7.2)")
    # the production answer: wrap the cycle in flexible CG
    from poms_tpu.mg.mixed import MGPreconditionedCG

    cfgc = CycleConfig(nu1=1, nu2=1,
                       smoother=SmootherConfig("chebyshev",
                                               cheb_fraction=16.0))
    pcg = MGPreconditionedCG(prob, num_levels=levels, cfg=cfgc,
                             mixed=True, operator="kron", precision="dw")
    x, rn, it = pcg.solve_compiled(tol=1e-10, maxiter=60)
    res_x = x
    print(f"MG-preconditioned CG (production config): converged="
          f"{float(rn) <= 1e-10} in {int(it)} iterations; "
          f"final residual {float(rn):.3e}")
    res = type(res)(x=res_x, residuals=res.residuals + [float(rn)],
                    iterations=int(it), converged=float(rn) <= 1e-10,
                    wall_times=res.wall_times)
    err = l2_error_manufactured(prob, res.x, pts_per_dim=32)
    print(f"L2 error vs u = sin(πx)sin(πy)sin(πz): {err:.3e}")
    rho = res.convergence_factors
    if rho:
        print(f"median convergence factor: {np.median(rho):.3f}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
