#!/bin/bash
# Round-5 wave-1 (VERDICT r4 "Next round" #3 first-control + #2b):
#   1. control        — current shipped defaults (roll + EMIT_D=48 + s2d feed)
#   2. roll0          — DEEPCAM_FUSED_ROLL=0 (re-confirm the r4 +1% flip)
#   3. emitd0         — DEEPCAM_FUSED_EMIT_D=0 (re-confirm the r4 +0.7% flip)
#   4. split_concat   — DEEPCAM_SPLIT_CONCAT=1 re-test on the r4-final graph
#                       (its 0.995x verdict predates BLOCK_LOSS/boundary/EMIT_D)
#   5. control2       — closing control (A/B/A discipline, CLAUDE.md ±2% band)
# No code edits may land on the kernel/model paths while this queue drains.
set -u
cd /root/repo
LOGD=analysis/r5_queue
mkdir -p "$LOGD"

run_arm () {
  local name="$1"; shift
  echo "=== $name $(date +%T)"
  env "$@" timeout 1800 python -u bench.py > "$LOGD/bench_$name.log" 2>&1
  grep '"metric"' "$LOGD/bench_$name.log" || tail -3 "$LOGD/bench_$name.log"
}

run_arm control
run_arm roll0        DEEPCAM_FUSED_ROLL=0
run_arm emitd0       DEEPCAM_FUSED_EMIT_D=0
run_arm split_concat DEEPCAM_SPLIT_CONCAT=1
run_arm control2
echo "=== wave1 done $(date +%T)"
