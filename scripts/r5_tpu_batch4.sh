#!/bin/bash
# Round-5 batch 4: pin the 1D jnp/pallas crossover for the dispatch policy.
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
for n in 1048576 2097152 4194304 8388608; do
  run_leg 1d_jnp_$n    poms_tpu.bench.one_impl jnp 1 $n 3
  run_leg 1d_pallas_$n poms_tpu.bench.one_impl pallas 1 $n 3
done
echo "=== BATCH4 DONE ($(date +%T))" >> "$LOG"
