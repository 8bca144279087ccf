"""Attribute the per-iteration cost of the mixed twofloat solve.

VERDICT r3 ask #3: the 128³ headline iteration measured ~160 ms while the
f32 V-cycle alone was ~13 ms — attribute the difference.  Times each
component of MixedPrecisionMG's twofloat step (mg/mixed.py::step_tf) as a
chained device loop with K/2K differencing (bench/roofline.py timing
rules):

  - cycle   : one f32 (or bf16) V-cycle on the cast hierarchy
  - resid   : double-word Kronecker residual (ops/twofloat.py)
  - norm    : double-word pairwise-tree norm
  - step    : the full fused outer step (sanity: ≈ cycle+resid+2·norm)

    python -m poms_tpu.bench.attr_iter <n_el> [degree]
"""
import json
import sys


def main():
    n_el = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax

    jax.config.update("jax_enable_x64", True)
    from poms_tpu.bench.kernel_probe import _enable_persistent_cache

    _enable_persistent_cache()
    import jax.numpy as jnp

    from poms_tpu.bench.roofline import time_step_loop
    from poms_tpu.core.vector import StencilVector
    from poms_tpu.mg.cycles import CycleConfig, cycle
    from poms_tpu.mg.mixed import MixedPrecisionMG
    from poms_tpu.mg.smoother import SmootherConfig
    from poms_tpu.models.poisson import poisson_problem
    from poms_tpu.ops.twofloat import (dw_norm2, residual_kron_df,
                                       split_f64)

    num_levels = max(2, (n_el - 1).bit_length() - 2)
    prob = poisson_problem(3, n_el, degree=degree, operator="kron",
                           dtype=jnp.float64)
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig("chebyshev",
                                              cheb_fraction=16.0))
    mg = MixedPrecisionMG(prob, num_levels=num_levels, cfg=cfg,
                          operator="kron", residual="twofloat")
    sp32 = mg.levels32[0].A.space
    bh, bl = split_f64(prob.b.interior)
    labels = mg.levels64[0].A._band_labels()
    pads = prob.space.pads
    from poms_tpu.mg.smoother import attach_spectral_estimates

    lams = attach_spectral_estimates(mg.levels64, cfg.smoother)

    out = {"n_el": n_el, "degree": degree, "levels": num_levels}

    def t_cycle(r32_int, *cs):
        v = StencilVector.from_interior(sp32, r32_int)
        e = cycle(mg.levels32, 0, StencilVector.zeros(sp32), v, cfg, lams)
        return e.interior

    out["cycle_s"] = time_step_loop(t_cycle, bh, iters=10)

    def t_resid(xh, *cs):
        rh, rl = residual_kron_df(mg._terms_df, bh, bl, xh,
                                  jnp.zeros_like(xh), pads, labels=labels)
        return rh

    out["resid_s"] = time_step_loop(t_resid, bh, iters=10)

    def t_norm(rh, *cs):
        n = dw_norm2(rh, jnp.zeros_like(rh))
        return rh * (1.0 + 0.0 * n.astype(rh.dtype))

    out["norm_s"] = time_step_loop(t_norm, bh, iters=10)

    def t_step(carry, *cs):
        xh, xl, rh, rl = carry
        xh, xl, rh, rl, rn = mg._step_tf_raw(mg.levels32, mg._terms_df,
                                             xh, xl, rh, rl, bh, bl)
        return (xh, xl, rh, rl)

    z = jnp.zeros_like(bh)
    out["step_s"] = time_step_loop(t_step, (z, z, bh, bl), iters=10)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
