#!/bin/bash
# Round-5 wave-4 (run SOLO — wave-3's controls were contaminated by
# concurrent CPU test suites + a degrading relay; keep the box idle):
#   1. control7       — clean control at the new defaults (SPLIT_CONCAT on)
#   2. csplit2        — whole-model A/B, CSPLIT=2 now gated to c<=128
#                       (server probe: c<=128 compiles+runs, c>=256 crashes
#                       the remote compile helper)
#   3. spatial probe  — fused kernels at the spatial-local H shapes (s=2/4)
#   4. eval overlap   — EVAL_OVERLAP=0 vs 1 at the batch-16 default
#   5. control8       — closing control
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

run_arm control7
run_arm csplit2 DEEPCAM_FUSED_CSPLIT=2
run_arm csplit2f DEEPCAM_FUSED_CSPLIT=2 DEEPCAM_FUSED_CSPLIT_FWD=1

echo "=== csplit4 deep probe (c>=256 shapes with 4 chunks) $(date +%T)"
for i in 3 4 5; do
  DEEPCAM_FUSED_CSPLIT=4 DEEPCAM_FUSED_CSPLIT_MAXC=1024 timeout 900 \
    python -u scripts/csplit_probe.py $i >> "$LOGD/csplit4_probe.log" 2>&1
done
grep -E "PROBE" "$LOGD/csplit4_probe.log" || tail -3 "$LOGD/csplit4_probe.log"

echo "=== spatial probe $(date +%T)"
timeout 3000 python -u scripts/spatial_probe.py \
  > "$LOGD/spatial_probe.log" 2>&1
grep -cE "PROBE OK" "$LOGD/spatial_probe.log" || tail -3 "$LOGD/spatial_probe.log"
grep -E "PROBE FAIL" "$LOGD/spatial_probe.log" || true

echo "=== eval overlap A/B $(date +%T)"
EVAL_SAMPLES=64 EVAL_CONFIGS="16:1" EVAL_OVERLAP=0 timeout 1800 \
  python -u scripts/eval_bench.py > "$LOGD/eval_noopt.log" 2>&1
grep '"metric"' "$LOGD/eval_noopt.log" || tail -3 "$LOGD/eval_noopt.log"
EVAL_SAMPLES=64 EVAL_CONFIGS="16:1" EVAL_OVERLAP=1 timeout 1800 \
  python -u scripts/eval_bench.py > "$LOGD/eval_overlap.log" 2>&1
grep '"metric"' "$LOGD/eval_overlap.log" || tail -3 "$LOGD/eval_overlap.log"

run_arm control8
echo "=== wave4 done $(date +%T)"
