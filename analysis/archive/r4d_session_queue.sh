#!/bin/bash
# Round-4 wave-4 serialized TPU queue: the two remaining arms.
#   1. DEEPCAM_FUSED_TAPS1=1 — merged backward tap loops (each activation
#      tap materialized once instead of twice)
#   2. DEEPCAM_BN_BWD=big — closed-form bf16 BN backward for the
#      full-resolution BNs only (deconv3_bn + entry bn1/bn2)
#   3. combined arm if both win; fresh control rides from wave-3 (24.22)
set -u
cd /root/repo
LOGD=analysis/r4_queue
mkdir -p "$LOGD"

echo "=== bench TAPS1 $(date +%T)"
DEEPCAM_FUSED_TAPS1=1 python -u bench.py > "$LOGD/bench_taps1.log" 2>&1
grep '"metric"' "$LOGD/bench_taps1.log" || tail -3 "$LOGD/bench_taps1.log"

echo "=== bench BN_BWD=big $(date +%T)"
DEEPCAM_BN_BWD=big python -u bench.py > "$LOGD/bench_bnbig.log" 2>&1
grep '"metric"' "$LOGD/bench_bnbig.log" || tail -3 "$LOGD/bench_bnbig.log"

t1=$(grep -o '"value": [0-9.]*' "$LOGD/bench_taps1.log" | head -1 | cut -d' ' -f2)
t2=$(grep -o '"value": [0-9.]*' "$LOGD/bench_bnbig.log" | head -1 | cut -d' ' -f2)
win1=$(python3 -c "print(1 if float('${t1:-0}') > 24.34 else 0)")
win2=$(python3 -c "print(1 if float('${t2:-0}') > 24.34 else 0)")
if [ "$win1" = 1 ] && [ "$win2" = 1 ]; then
  echo "=== bench combined $(date +%T)"
  DEEPCAM_FUSED_TAPS1=1 DEEPCAM_BN_BWD=big python -u bench.py \
    > "$LOGD/bench_combo.log" 2>&1
  grep '"metric"' "$LOGD/bench_combo.log"
fi

echo "=== wave4 done $(date +%T)"
