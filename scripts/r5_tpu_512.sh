#!/bin/bash
# 512^3 legs, rerun after the RHS-assembly OOM fix (broadcast outer
# product).  Serialized, one TPU process at a time.
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
run_leg s512_tf  poms_tpu.bench.one_solve 512 3 1e-10 twofloat
run_leg p512_dw  poms_tpu.bench.one_pcg   512 3 1e-10 dw
echo "=== 512 LEGS DONE ($(date +%T))" >> "$LOG"
