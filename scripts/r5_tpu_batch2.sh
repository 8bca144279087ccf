#!/bin/bash
# Round-5 batch 2: 512^3 (low-memory bench path), post-shave PCG numbers,
# PCG attribution, lane-fold feasibility probes, honest 1D row.
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
# post-shave PCG/DC perf at 128/256 (dw sum-tree merge + scale reuse)
run_leg p128_shaved poms_tpu.bench.one_pcg   128 3 1e-10 dw
run_leg p256_shaved poms_tpu.bench.one_pcg   256 3 1e-10 dw
run_leg s128_shaved poms_tpu.bench.one_solve 128 3 1e-10 twofloat
# attribution of the PCG iteration (VERDICT r4 missing #6)
run_leg attr_pcg128 poms_tpu.bench.attr_iter 128 3 pcg
run_leg attr_dc128  poms_tpu.bench.attr_iter 128 3 dc
# 512^3 scale runs (low-memory path active at n>=384)
run_leg s512_tf  poms_tpu.bench.one_solve 512 3 1e-10 twofloat
run_leg p512_dw  poms_tpu.bench.one_pcg   512 3 1e-10 dw
# lane-fold feasibility probes (VERDICT r4 missing #3): same point count
# as 64^3 with folded lane geometry — the ceiling a seam-fixup kernel
# could reach; plus the pure lane-padding isolation at (64,64,128)
run_leg probe_64c    poms_tpu.bench.one_impl pallas 3 64 3
run_leg probe_fold   poms_tpu.bench.one_impl pallas 3 64x32x128 3
run_leg probe_lanes  poms_tpu.bench.one_impl pallas 3 64x64x128 3
run_leg probe_64jnp  poms_tpu.bench.one_impl jnp 3 64 3
# honest 1D capability row: 2^24 elements (the 2^20 row measures dispatch)
run_leg probe_1d24   poms_tpu.bench.one_impl jnp 1 16777216 3
echo "=== BATCH2 DONE ($(date +%T))" >> "$LOG"
