#!/bin/bash
# Round-4 wave-8: A/B/A confirmation of EMIT_D=48 (graphs cached — fast).
set -u
cd /root/repo
LOGD=analysis/r4_queue
echo "=== bench EMIT_D=48 (confirm) $(date +%T)"
DEEPCAM_FUSED_EMIT_D=48 python -u bench.py > "$LOGD/bench_emitd48b.log" 2>&1
grep '"metric"' "$LOGD/bench_emitd48b.log"
echo "=== bench control (confirm) $(date +%T)"
python -u bench.py > "$LOGD/bench_control5.log" 2>&1
grep '"metric"' "$LOGD/bench_control5.log"
echo "=== bench EMIT_D=48 (confirm2) $(date +%T)"
DEEPCAM_FUSED_EMIT_D=48 python -u bench.py > "$LOGD/bench_emitd48c.log" 2>&1
grep '"metric"' "$LOGD/bench_emitd48c.log"
echo "=== wave8 done $(date +%T)"
