#!/bin/bash
# Round-5 wave-2:
#   1. split_concat2  — confirm wave-1's 25.65 (+1.3%) on an A/B/A ladder
#   2. csplit probe   — server-side Mosaic compile of the CSPLIT=2 backward
#                       at all 6 entry shapes (local AOT already passes; only
#                       a hardware compile is conclusive — 4 recorded
#                       divergences)
#   3. csplit bench   — whole-model A/B (only meaningful if probe passes)
#   4. b6             — per-chip batch 6 re-test on the modern graph (knee
#                       was measured at b4 in r2, before the kernel wins)
#   5. control3       — closing control
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

run_arm split_concat2 DEEPCAM_SPLIT_CONCAT=1

echo "=== csplit probe $(date +%T)"
DEEPCAM_FUSED_CSPLIT=2 timeout 3000 python -u scripts/csplit_probe.py \
  > "$LOGD/csplit_probe.log" 2>&1
grep -E "PROBE" "$LOGD/csplit_probe.log" || tail -5 "$LOGD/csplit_probe.log"

if grep -q "PROBE FAIL" "$LOGD/csplit_probe.log"; then
  echo "csplit probe FAILED on at least one shape — skipping whole-model arm"
else
  run_arm csplit2 DEEPCAM_FUSED_CSPLIT=2
fi

run_arm b6 BENCH_LOCAL_BATCH=6
run_arm control3
echo "=== wave2 done $(date +%T)"
