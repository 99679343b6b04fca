#!/bin/bash
# Round-4 wave-6 serialized TPU queue: kernel bwd-traffic arms.
#   1. DEEPCAM_FUSED_DD16=1 — bf16 pointwise-dgrad for the tap loops
#   2. DEEPCAM_FUSED_EMIT_D=96 — entry units read the fwd-emitted dw
#      output instead of the 9-tap recompute
#   3. combined arm if either wins (vs wave-3/4's 24.22 control band)
set -u
cd /root/repo
LOGD=analysis/r4_queue
mkdir -p "$LOGD"

echo "=== bench DD16 $(date +%T)"
DEEPCAM_FUSED_DD16=1 python -u bench.py > "$LOGD/bench_dd16.log" 2>&1
grep '"metric"' "$LOGD/bench_dd16.log" || tail -3 "$LOGD/bench_dd16.log"

echo "=== bench EMIT_D=96 $(date +%T)"
DEEPCAM_FUSED_EMIT_D=96 python -u bench.py > "$LOGD/bench_emitd.log" 2>&1
grep '"metric"' "$LOGD/bench_emitd.log" || tail -3 "$LOGD/bench_emitd.log"

t1=$(grep -o '"value": [0-9.]*' "$LOGD/bench_dd16.log" | head -1 | cut -d' ' -f2)
t2=$(grep -o '"value": [0-9.]*' "$LOGD/bench_emitd.log" | head -1 | cut -d' ' -f2)
w1=$(python3 -c "print(1 if float('${t1:-0}') > 24.32 else 0)")
w2=$(python3 -c "print(1 if float('${t2:-0}') > 24.32 else 0)")
if [ "$w1" = 1 ] || [ "$w2" = 1 ]; then
  echo "=== bench combined $(date +%T)"
  DEEPCAM_FUSED_DD16=1 DEEPCAM_FUSED_EMIT_D=96 python -u bench.py \
    > "$LOGD/bench_dd16_emitd.log" 2>&1
  grep '"metric"' "$LOGD/bench_dd16_emitd.log"
fi
echo "=== wave6 done $(date +%T)"
