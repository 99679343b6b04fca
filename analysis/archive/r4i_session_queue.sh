#!/bin/bash
# Round-4 wave-9: definitive final-defaults (EMIT_D=48) trace + audit,
# plus a TH_ENTRY=32 retest — the tile VMEM economics changed with the
# dw recompute gone.
set -u
cd /root/repo
LOGD=analysis/r4_queue

echo "=== bench TH_ENTRY=32 (with EMIT_D) $(date +%T)"
DEEPCAM_FUSED_TH_ENTRY=32 DEEPCAM_FUSED_VMEM_MB=160 \
DEEPCAM_FUSED_VMEM_LIMIT_MB=115 python -u bench.py \
  > "$LOGD/bench_th32b.log" 2>&1
grep '"metric"' "$LOGD/bench_th32b.log" || tail -3 "$LOGD/bench_th32b.log"

echo "=== step trace (emit_d=48 defaults) $(date +%T)"
python -u scripts/step_trace.py 4 /tmp/xprof_r4i > "$LOGD/step_trace_emitd.log" 2>&1
tail -3 "$LOGD/step_trace_emitd.log"

echo "=== kernel audit (emit_d=48 defaults) $(date +%T)"
python -u scripts/kernel_audit.py /tmp/xprof_r4i 4 > "$LOGD/kernel_audit_emitd.log" 2>&1
tail -3 "$LOGD/kernel_audit_emitd.log"

echo "=== wave9 done $(date +%T)"
