#!/bin/bash
# Round-5 wave-6: middle-flow row-tile re-probe.  th=24 Mosaic-OOM'd in r2,
# but EMIT_D (no dw-recompute loop) + roll (no concat buffers) shrank the
# kernel's working set since; bigger tiles = fewer grid steps = fewer
# weight/accumulator refetches.
#   1. th24     — DEEPCAM_FUSED_TH=24
#   2. th48     — DEEPCAM_FUSED_TH=48 (whole middle-flow image per grid step)
#   3. control10 — closing control
set -u
cd /root/repo
LOGD=analysis/r5_queue
mkdir -p "$LOGD"

run_arm () {
  local name="$1"; shift
  echo "=== $name $(date +%T)"
  env "$@" timeout 2400 python -u bench.py > "$LOGD/bench_$name.log" 2>&1
  grep '"metric"' "$LOGD/bench_$name.log" || tail -3 "$LOGD/bench_$name.log"
}

run_arm th24 DEEPCAM_FUSED_TH=24
run_arm th48 DEEPCAM_FUSED_TH=48
run_arm control10
echo "=== wave6 done $(date +%T)"
