#!/bin/bash
# Round-4 wave-5 (final) serialized TPU queue:
#   1. eval bench at batch 16 (is the eval knee past 8?)
#   2. step trace + kernel audit at the FINAL r4 defaults (boundary fold
#      on) — the round-end record and the round-5 planning input
set -u
cd /root/repo
LOGD=analysis/r4_queue
mkdir -p "$LOGD"

echo "=== eval bench b16 $(date +%T)"
EVAL_CONFIGS="16:1" EVAL_SAMPLES=32 python -u scripts/eval_bench.py \
  > "$LOGD/eval_bench16.log" 2>&1
grep '"eval' "$LOGD/eval_bench16.log" || tail -3 "$LOGD/eval_bench16.log"

echo "=== step trace (final defaults) $(date +%T)"
python -u scripts/step_trace.py 4 /tmp/xprof_r4f > "$LOGD/step_trace_final.log" 2>&1
tail -5 "$LOGD/step_trace_final.log"

echo "=== kernel audit (final defaults) $(date +%T)"
python -u scripts/kernel_audit.py /tmp/xprof_r4f 4 > "$LOGD/kernel_audit_final.log" 2>&1
tail -3 "$LOGD/kernel_audit_final.log"

echo "=== wave5 done $(date +%T)"
