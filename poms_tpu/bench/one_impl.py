"""Run one SpMV benchmark impl in an isolated process.

The TPU tunnel on this machine can stall indefinitely (remote-compile
service flakiness), so ``bench.py`` executes each implementation as
``python -m poms_tpu.bench.one_impl <impl> <d> <n> <degree>`` under a hard
timeout and parses the single RESULT line.
"""
import json
import sys


def main():
    impl = sys.argv[1]
    d = int(sys.argv[2])
    # <n> is either a cube edge ("128") or an explicit non-cubic grid
    # ("64x32x128" — used by the lane-fold feasibility probes)
    n_s = sys.argv[3]
    degree = int(sys.argv[4])
    iters = int(sys.argv[5]) if len(sys.argv) > 5 else 20
    dtype_s = sys.argv[6] if len(sys.argv) > 6 else "f32"

    import jax.numpy as jnp

    from poms_tpu.bench.kernel_probe import _enable_persistent_cache
    from poms_tpu.bench.roofline import bench_spmv

    _enable_persistent_cache()

    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype_s]
    npts = (tuple(int(s) for s in n_s.split("x")) if "x" in n_s
            else (int(n_s),) * d)
    r = bench_spmv(npts, degree=degree, dtype=dtype, iters=iters,
                   impl=impl)
    print("RESULT " + json.dumps({
        "name": r.name, "wall_s": r.wall_s, "gbytes_per_s": r.gbytes_per_s,
        "gnnz_per_s": r.gnnz_per_s, "pct_sol": r.pct_sol,
        "grid": list(r.grid), "dtype": r.dtype}), flush=True)


if __name__ == "__main__":
    main()
