#!/usr/bin/env python
"""Benchmark entry point for the driver.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.json:2): banded stencil SpMV throughput on the
3D cubic-B-spline operator (config 3's hot kernel), f32, on one chip.
``vs_baseline``: achieved HBM bandwidth ÷ speed-of-light bandwidth for the
local chip (BASELINE.md: the reference publishes no numbers, so SoL is the
baseline; the target band is ≥ 0.8).

Extra rows (human-readable) go to stderr; the single JSON line is stdout.
"""
import json
import sys


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from poms_tpu.bench.roofline import bench_spmv, sol_bandwidth

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} (platform {dev.platform})")
    sol = sol_bandwidth(dev)
    log(f"assumed HBM SoL: {sol} GB/s")

    npts = (128, 128, 128)
    degree = 3
    results = {}
    for impl in ("pallas", "jnp"):
        try:
            r = bench_spmv(npts, degree=degree, dtype=jnp.float32,
                           iters=20, impl=impl)
            results[impl] = r
            log(r.row())
        except Exception as e:  # noqa: BLE001 — report and continue
            log(f"impl {impl} failed: {type(e).__name__}: {e}")
    if not results:
        print(json.dumps({"metric": "spmv_3d_cubic_f32_bandwidth",
                          "value": 0.0, "unit": "GB/s", "vs_baseline": 0.0}))
        return 1
    best_impl = max(results, key=lambda k: results[k].gbytes_per_s)
    best = results[best_impl]
    log(f"best impl: {best_impl}")
    print(json.dumps({
        "metric": "spmv_3d_cubic_f32_bandwidth",
        "value": round(best.gbytes_per_s, 2),
        "unit": "GB/s",
        "vs_baseline": round(best.gbytes_per_s / sol, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
