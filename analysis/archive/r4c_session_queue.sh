#!/bin/bash
# Round-4 wave-3 serialized TPU queue (after the boundary-fold default
# flip): the audit-driven arms.
#   1. control3 at the new defaults (boundary-fold graph cached from w2)
#   2. DEEPCAM_BN_BWD=1 — closed-form bf16 BN backward (kills the fp32
#      cotangent streams around XLA-producer BNs; ~15-20 ms in scope)
#   3. DEEPCAM_FUSED_TH_ENTRY=32 — double the entry-flow kernel row tiles
#      (audit: entry backwards at 10-25% of roofline); raised budgets
#   4. DEEPCAM_FUSED_MIN_CH=256 — entry units back to XLA, retest at the
#      current defaults (last measured r2)
set -u
cd /root/repo
LOGD=analysis/r4_queue
mkdir -p "$LOGD"

echo "=== bench control3 $(date +%T)"
python -u bench.py > "$LOGD/bench_control3.log" 2>&1
grep '"metric"' "$LOGD/bench_control3.log"

echo "=== bench BN_BWD=1 $(date +%T)"
DEEPCAM_BN_BWD=1 python -u bench.py > "$LOGD/bench_bnbwd.log" 2>&1
grep '"metric"' "$LOGD/bench_bnbwd.log" || tail -3 "$LOGD/bench_bnbwd.log"

echo "=== bench TH_ENTRY=32 $(date +%T)"
DEEPCAM_FUSED_TH_ENTRY=32 DEEPCAM_FUSED_VMEM_MB=160 \
DEEPCAM_FUSED_VMEM_LIMIT_MB=115 python -u bench.py \
  > "$LOGD/bench_th32.log" 2>&1
grep '"metric"' "$LOGD/bench_th32.log" || tail -3 "$LOGD/bench_th32.log"

echo "=== bench MIN_CH=256 $(date +%T)"
DEEPCAM_FUSED_MIN_CH=256 python -u bench.py > "$LOGD/bench_minch.log" 2>&1
grep '"metric"' "$LOGD/bench_minch.log" || tail -3 "$LOGD/bench_minch.log"

echo "=== wave3 done $(date +%T)"
