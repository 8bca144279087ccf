#!/bin/bash
# Round-5 scale runs (VERDICT r4 asks #1 and #2), serialized: ONE TPU
# process at a time (two TPU processes through the tunnel contend and
# hang — memory: tpu-tunnel-and-mosaic-empirics).  Each leg runs under
# timeout with one retry (tunnel pallas/XLA compiles stall intermittently;
# retry usually succeeds off the persistent compile cache).
set -u
cd /root/repo
LOG=${LOG:-/root/repo/r5_runs.log}
run_leg() {
  local name="$1"; shift
  echo "=== LEG $name: $* ($(date +%T))" >> "$LOG"
  for attempt in 1 2; do
    timeout "${LEG_TIMEOUT:-3000}" python -m "$@" >> "$LOG" 2>&1
    rc=$?
    echo "--- $name attempt $attempt rc=$rc ($(date +%T))" >> "$LOG"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

run_leg s256_tf  poms_tpu.bench.one_solve 256 3 1e-10 twofloat
run_leg p256_dw  poms_tpu.bench.one_pcg   256 3 1e-10 dw
run_leg s128_bf16 poms_tpu.bench.one_solve 128 3 1e-10 twofloat 1 16 4 bf16
run_leg p128_bf16 poms_tpu.bench.one_pcg   128 3 1e-10 dw 16 4 bf16
run_leg p256_bf16 poms_tpu.bench.one_pcg   256 3 1e-10 dw 16 4 bf16
run_leg s512_tf  poms_tpu.bench.one_solve 512 3 1e-10 twofloat
run_leg p512_dw  poms_tpu.bench.one_pcg   512 3 1e-10 dw
echo "=== ALL LEGS DONE ($(date +%T))" >> "$LOG"
