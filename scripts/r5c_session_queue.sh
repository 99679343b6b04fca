#!/bin/bash
# Round-5 wave-3:
#   1. control4      — NEW defaults (SPLIT_CONCAT now default-on) — should
#                      reproduce the 25.65 arm readings
#   2. csplit probe  — server-side Mosaic compile, all 6 entry shapes
#                      (wave-2 attempt died on a sys.path bug, now fixed)
#   3. csplit2 bench — whole-model A/B at CSPLIT=2 (skipped if probe fails)
#   4. control5      — closing control
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

run_arm control4

echo "=== csplit probe $(date +%T)"
DEEPCAM_FUSED_CSPLIT=2 timeout 3000 python -u scripts/csplit_probe.py \
  > "$LOGD/csplit_probe.log" 2>&1
grep -E "PROBE" "$LOGD/csplit_probe.log" || tail -5 "$LOGD/csplit_probe.log"

if grep -q "PROBE FAIL" "$LOGD/csplit_probe.log"; then
  echo "csplit probe FAILED — skipping whole-model arm"
else
  run_arm csplit2 DEEPCAM_FUSED_CSPLIT=2
fi

run_arm control5
echo "=== wave3 done $(date +%T)"
