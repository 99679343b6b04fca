#!/bin/bash
# Round-5 wave-5: stale-neutral re-tests on the r5-default graph.
# Rationale: SPLIT_CONCAT inverted 0.995x -> +1.3% when the graph
# neighborhood changed (r5 w1-2); these arms' verdicts predate
# EMIT_D/s2d-input/roll/split-concat:
#   1. bnbwd_big — DEEPCAM_BN_BWD=big (0.999x @ r4 w4)
#   2. skip_vjp  — DEEPCAM_SKIP_VJP=1 (neutral @ r2!)
#   3. dd16      — DEEPCAM_FUSED_DD16=1 (0.994x @ r4 w6)
#   4. eval32    — batch-32 overlapped eval (the knee may move with the
#                  per-batch fetches gone)
#   5. control9  — closing control
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

run_arm bnbwd_big DEEPCAM_BN_BWD=big
run_arm skip_vjp DEEPCAM_SKIP_VJP=1
run_arm dd16 DEEPCAM_FUSED_DD16=1

echo "=== eval32 overlap $(date +%T)"
EVAL_SAMPLES=64 EVAL_CONFIGS="32:1" EVAL_OVERLAP=1 timeout 1800 \
  python -u scripts/eval_bench.py > "$LOGD/eval_overlap32.log" 2>&1
grep '"metric"' "$LOGD/eval_overlap32.log" || tail -3 "$LOGD/eval_overlap32.log"

run_arm control9
echo "=== wave5 done $(date +%T)"
