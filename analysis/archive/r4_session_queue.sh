#!/bin/bash
# Round-4 HARVEST-FIRST serialized TPU queue (VERDICT r3 item 1).
# One chip, one client at a time; never kills a child (relay wedge).
# Logs land in analysis/r4_queue/ (IN the repo — r2/r3 stranded their
# results in /tmp and lost them; never again).
#
# Stages:
#   1. s2v2 compile probe (shape-keyed affine th picker, r4 fix)
#   2. bench control at current defaults (warms the compile cache)
#   3. DEEPCAM_FUSED_S2=2 arm — gated on the probe's DONE sentinel
#   3b. fallback arm: FUSED_S2=2 + PLAIN_W=512 (block1 affine via XLA FMA
#       + plain kernel) if block1-affine still fails but everything else
#       passed
#   4. DEEPCAM_FUSED_MAX_DIL=1 arm (exit-flow dilation-2 sepconvs to XLA)
#   5. DEEPCAM_STATS_INKERNEL=1 re-test (r3 wave-1 was within noise)
#   6. eval-path hardware bench (r2 verdict item 4, two rounds overdue)
set -u
cd /root/repo
LOGD=analysis/r4_queue
mkdir -p "$LOGD"

echo "=== s2v2 probe $(date +%T)"
python -u scripts/s2v2_compile_probe.py > "$LOGD/s2v2_probe.log" 2>&1
grep "PROBE" "$LOGD/s2v2_probe.log"

# Gate per ADVICE r3: require the full-grad DONE sentinel with ok=1.
probe_ok=0
grep -q "PROBE DONE stage=grad ok=1" "$LOGD/s2v2_probe.log" && probe_ok=1
# Partial pass good enough for the fallback arm: every non-block1-affine
# job OK (5/6 passed, the one FAIL being the (384,576) affine).
fallback_ok=0
if [ "$probe_ok" = 0 ] \
   && grep -q "PROBE DONE stage=grad ok=0 passed=5/6" "$LOGD/s2v2_probe.log" \
   && grep -q "PROBE (384,576,128,128) affine: FAIL" "$LOGD/s2v2_probe.log"; then
  fallback_ok=1
fi
echo "probe_ok=$probe_ok fallback_ok=$fallback_ok"

echo "=== bench control $(date +%T)"
python -u bench.py > "$LOGD/bench_control.log" 2>&1
grep '"metric"' "$LOGD/bench_control.log"

if [ "$probe_ok" = 1 ]; then
  echo "=== bench FUSED_S2=2 $(date +%T)"
  DEEPCAM_FUSED_S2=2 python -u bench.py > "$LOGD/bench_s2v2.log" 2>&1
  grep '"metric"' "$LOGD/bench_s2v2.log"
elif [ "$fallback_ok" = 1 ]; then
  echo "=== bench FUSED_S2=2 PLAIN_W=512 $(date +%T)"
  DEEPCAM_FUSED_S2=2 DEEPCAM_FUSED_S2_PLAIN_W=512 python -u bench.py \
    > "$LOGD/bench_s2v2_plainw.log" 2>&1
  grep '"metric"' "$LOGD/bench_s2v2_plainw.log"
fi

echo "=== bench dil2_xla $(date +%T)"
DEEPCAM_FUSED_MAX_DIL=1 python -u bench.py > "$LOGD/bench_dil2.log" 2>&1
grep '"metric"' "$LOGD/bench_dil2.log"

echo "=== bench stats_inkernel $(date +%T)"
DEEPCAM_STATS_INKERNEL=1 python -u bench.py > "$LOGD/bench_inkernel.log" 2>&1
grep '"metric"' "$LOGD/bench_inkernel.log"

echo "=== eval bench $(date +%T)"
python -u scripts/eval_bench.py > "$LOGD/eval_bench.log" 2>&1
grep '"eval' "$LOGD/eval_bench.log"

echo "=== queue done $(date +%T)"
