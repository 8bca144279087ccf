"""Headline-metric benchmark: V-cycle wall time to ‖r‖ ≤ 1e-10, 3D Poisson.

BASELINE.json:2 primary metric 2 (VERDICT r2 ask #4: "the headline metric
is never benchmarked").  Runs the production mixed-precision configuration
— Kronecker-sum operator, Chebyshev-smoothed f32 cycles inside the
two-float (EFT) defect-correction loop (mg/mixed.py, residual='twofloat':
no f64 emulation in the iterate loop) — as one isolated process printing a
single RESULT line:

    python -m poms_tpu.bench.one_solve <n_el> [degree] [tol]
"""
import json
import sys


def main():
    n_el = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-10

    import jax

    jax.config.update("jax_enable_x64", True)
    from poms_tpu.bench.kernel_probe import _enable_persistent_cache

    _enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from poms_tpu.mg.cycles import CycleConfig
    from poms_tpu.mg.mixed import MixedPrecisionMG
    from poms_tpu.mg.smoother import SmootherConfig
    from poms_tpu.models.poisson import poisson_problem

    num_levels = max(2, (n_el - 1).bit_length() - 2)  # coarsest ~8 el/dim
    prob = poisson_problem(3, n_el, degree=degree, operator="kron",
                           dtype=jnp.float64)
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig("chebyshev",
                                              cheb_fraction=16.0))
    mg = MixedPrecisionMG(prob, num_levels=num_levels, cfg=cfg,
                          operator="kron")
    res = mg.solve(tol=tol, maxiter=100)
    # wall_times[0] includes compile; steady-state per-iter = median of rest
    steady = res.wall_times[1:] or res.wall_times
    per_iter = float(np.median(steady))
    wall = per_iter * res.iterations
    print("RESULT " + json.dumps({
        "name": f"vcycle3d_n{n_el}_p{degree}_to_{tol:g}",
        "converged": bool(res.converged),
        "iterations": res.iterations,
        "per_iter_s": per_iter,
        "wall_to_tol_s": wall,
        "wall_incl_warmup_s": float(sum(res.wall_times)),
        "final_residual": res.residuals[-1],
        "residual_mode": mg.residual_mode,
        "grid": [n_el] * 3, "levels": num_levels}), flush=True)


if __name__ == "__main__":
    main()
