#!/bin/bash
# Round-5 batch 3: 256^3 attribution, 1D pallas probe, full bench sweep.
set -u
cd /root/repo
LOG=${LOG:-/root/repo/r5_runs.log}
run_leg() {
  local name="$1"; shift
  echo "=== LEG $name: $* ($(date +%T))" >> "$LOG"
  for attempt in 1 2; do
    timeout "${LEG_TIMEOUT:-3600}" python -m "$@" >> "$LOG" 2>&1
    rc=$?
    echo "--- $name attempt $attempt rc=$rc ($(date +%T))" >> "$LOG"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}
run_leg attr_pcg256 poms_tpu.bench.attr_iter 256 3 pcg
run_leg attr_dc256  poms_tpu.bench.attr_iter 256 3 dc
run_leg probe_1d24_pallas poms_tpu.bench.one_impl pallas 1 16777216 3
echo "=== LEG bench_full ($(date +%T))" >> "$LOG"
timeout 5400 python bench.py >> "$LOG" 2>&1
echo "--- bench_full rc=$? ($(date +%T))" >> "$LOG"
echo "=== BATCH3 DONE ($(date +%T))" >> "$LOG"
