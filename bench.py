#!/usr/bin/env python
"""Benchmark entry point for the driver.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric (BASELINE.json:2): banded stencil SpMV throughput on the
3D cubic-B-spline operator (config 3's hot kernel), f32, one chip.
``vs_baseline``: achieved HBM bandwidth ÷ speed-of-light bandwidth for the
local chip (BASELINE.md: the reference publishes no numbers, so the
roofline is the baseline; the target band is ≥ 0.8).

Each implementation runs in its own subprocess under a hard timeout — the
TPU tunnel on this machine can stall indefinitely mid-compile, and the
driver must always receive the JSON line.  Human-readable rows go to
stderr.
"""
import json
import os
import subprocess
import sys

TIMEOUT_S = int(os.environ.get("POMS_BENCH_TIMEOUT", "1500"))
DIM, N, DEGREE = 3, 128, 3


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _run_subproc(cmd, tag):
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=TIMEOUT_S,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        log(f"{tag}: TIMEOUT after {TIMEOUT_S}s (tunnel stall?)")
        return None
    for line in proc.stdout.splitlines():
        # take the first RESULT line that parses as JSON (probes also print
        # human-readable "RESULT name: ..." rows on stdout)
        if line.startswith("RESULT "):
            try:
                return json.loads(line[len("RESULT "):])
            except json.JSONDecodeError:
                continue
    tail = (proc.stderr or "").strip().splitlines()[-3:]
    log(f"{tag}: no result (exit {proc.returncode}); stderr tail: "
        + " | ".join(tail))
    return None


def run_impl(impl, n=None):
    return _run_subproc(
        [sys.executable, "-u", "-m", "poms_tpu.bench.one_impl",
         impl, str(DIM), str(n if n is not None else N), str(DEGREE)],
        f"impl {impl}")


def run_solve(n_el, residual="auto"):
    return _run_subproc(
        [sys.executable, "-u", "-m", "poms_tpu.bench.one_solve",
         str(n_el), str(DEGREE), "1e-10", residual],
        f"solve n_el={n_el} residual={residual}")


def run_pcg(n_el, precision="dw"):
    return _run_subproc(
        [sys.executable, "-u", "-m", "poms_tpu.bench.one_pcg",
         str(n_el), str(DEGREE), "1e-10", precision],
        f"pcg n_el={n_el} precision={precision}")


def main():
    sol = 819.0
    try:
        import jax

        dev = jax.devices()[0]
        log(f"device: {dev.device_kind} (platform {dev.platform})")
        from poms_tpu.bench.roofline import sol_bandwidth

        sol = sol_bandwidth(dev)
    except Exception as e:  # noqa: BLE001
        log(f"device probe failed: {e}")
    log(f"assumed HBM SoL: {sol} GB/s")

    impls = os.environ.get("POMS_BENCH_IMPLS",
                           "jnp,kron,pallas,streamfloor,xlastream").split(",")
    results = {}
    for impl in impls:
        r = run_impl(impl)
        if r is not None:
            results[impl] = r
            log(f"{r['name']}: {r['wall_s']*1e3:.2f} ms  "
                f"{r['gbytes_per_s']:.1f} GB/s  {r['gnnz_per_s']:.2f} Gnnz/s"
                f"  {r['pct_sol']:.1f}% SoL")
    # the small-lane lane-folded path at 64³ (round-5 close: 70% SoL
    # where the unfolded paths sit at 12–14%)
    fold64 = run_impl("fold2", 64)
    if fold64 is not None:
        log(f"{fold64['name']} (64³): {fold64['wall_s']*1e3:.2f} ms  "
            f"{fold64['pct_sol']:.1f}% SoL")
    # headline metric 2 (BASELINE.json:2): V-cycle wall to 1e-10, 3D —
    # BOTH residual modes with identical accounting (VERDICT r3 ask #3)
    solves = {}
    for n_el in [int(s) for s in
                 os.environ.get("POMS_BENCH_SOLVE", "64,128,256").split(",")
                 if s]:
        solves[n_el] = {}
        # the twofloat-vs-f64 A/B is pinned at 64/128 (BASELINE.md round
        # 4); at 256+ only the production twofloat mode runs — the f64
        # leg would spend minutes re-measuring a settled 3.5× loss
        residuals = os.environ.get(
            "POMS_BENCH_RESIDUALS",
            "twofloat,f64" if n_el <= 128 else "twofloat")
        for residual in residuals.split(","):
            r = run_solve(n_el, residual)
            if r is not None:
                solves[n_el][r["residual_mode"]] = r
                log(f"{r['name']}: {r['iterations']} cycles x "
                    f"{r['per_iter_s']*1e3:.1f} ms = "
                    f"{r['wall_to_tol_s']:.3f} s"
                    f" (converged={r['converged']}, host-loop "
                    f"{r['host_loop_per_iter_s']*1e3:.1f} ms/iter)")
        if not solves[n_el]:
            del solves[n_el]
    # dw-precision MG-preconditioned CG: the fastest measured path to
    # 1e-10 (round 5: 12.06 s at 512³ — 9 iterations at EVERY size
    # 64..512; the banded format physically cannot reach 256³+, the
    # kron+EFT path runs 512³ in a handful of 0.5–1 GB fields)
    pcgs = {}
    for n_el in [int(s) for s in
                 os.environ.get("POMS_BENCH_PCG", "64,128,256,512")
                 .split(",") if s]:
        r = run_pcg(n_el)
        if r is not None:
            pcgs[n_el] = r
            log(f"{r['name']}: {r['iterations']} iters x "
                f"{r['per_iter_s']*1e3:.1f} ms = {r['wall_to_tol_s']:.3f} s"
                f" (converged={r['converged']})")
    if not results:
        print(json.dumps({"metric": "spmv_3d_cubic_f32_gnnz_per_s",
                          "value": 0.0, "unit": "Gnnz/s",
                          "vs_baseline": 0.0}))
        return 1
    _PROBES = ("streamfloor", "xlastream", "xlastreamrw")
    real = {k: v for k, v in results.items() if k not in _PROBES}
    best_impl = max(real or results, key=lambda k: results[k]["gnnz_per_s"])
    best = results[best_impl]
    log(f"best impl: {best_impl}")
    # baseline = the chip's conservative banded-storage speed-of-light
    # (BASELINE.md: sol_GBps / 8B-per-nnz); >1 means beating what ANY
    # banded implementation could reach on this chip
    sol_gnnz = sol / 8.0
    doc = {
        "metric": "spmv_3d_cubic_f32_gnnz_per_s",
        "value": round(best["gnnz_per_s"], 2),
        "unit": "Gnnz/s",
        "vs_baseline": round(best["gnnz_per_s"] / sol_gnnz, 4),
        # secondary metrics, recorded explicitly so the pallas-vs-80%-bar
        # status and the headline solve are visible in the artifact
        # (VERDICT r2 weak #9 / ask #4)
        "pallas_pct_sol": (round(results["pallas"]["pct_sol"], 1)
                           if "pallas" in results else None),
        "fold2_64_pct_sol": (round(fold64["pct_sol"], 1)
                             if fold64 is not None else None),
        # MEASURED ceiling (round-4 re-based — VERDICT r3 weak #2): the max
        # same-session achieved GB/s over the streaming probes, which now
        # include NON-Pallas plain-XLA streams (xlastream: read+reduce over
        # band-sized data; xlastreamrw: elementwise read+write), not just
        # the Pallas-pipelined streamfloor.  Round 4 (with the K/2K timing
        # fix) measures the consuming-stream ceiling at ~763 GB/s (93% of
        # spec) and v1 at 98% of it — BASELINE.md round-4 ladder.
        "measured_stream_ceiling_gbps": (max(
            (round(results[p]["gbytes_per_s"], 1)
             for p in _PROBES if p in results), default=None)),
        "pallas_pct_of_measured_ceiling": (
            round(100.0 * results["pallas"]["gbytes_per_s"]
                  / max(results[p]["gbytes_per_s"]
                        for p in _PROBES if p in results), 1)
            if "pallas" in results and any(p in results for p in _PROBES)
            else None),
        "vcycle3d_to_1e10": {
            str(n): {mode: {"wall_s": round(r["wall_to_tol_s"], 4),
                            "iterations": r["iterations"],
                            "per_iter_s": round(r["per_iter_s"], 5),
                            "host_loop_per_iter_s":
                                round(r["host_loop_per_iter_s"], 5),
                            "converged": r["converged"]}
                     for mode, r in by_mode.items()}
            for n, by_mode in solves.items()},
        "pcg3d_dw_to_1e10": {
            str(n): {"wall_s": round(r["wall_to_tol_s"], 4),
                     "iterations": r["iterations"],
                     "per_iter_s": round(r["per_iter_s"], 5),
                     "converged": r["converged"]}
            for n, r in pcgs.items()},
    }
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    sys.exit(main())
