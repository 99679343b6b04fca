#!/bin/bash
# Round-4 wave-7 (final): confirmation + EMIT_D threshold sweep + the
# definitive final-defaults trace/audit.
set -u
cd /root/repo
LOGD=analysis/r4_queue
mkdir -p "$LOGD"

echo "=== bench control4 (EMIT_D default) $(date +%T)"
python -u bench.py > "$LOGD/bench_control4.log" 2>&1
grep '"metric"' "$LOGD/bench_control4.log"

echo "=== bench EMIT_D=192 $(date +%T)"
DEEPCAM_FUSED_EMIT_D=192 python -u bench.py > "$LOGD/bench_emitd192.log" 2>&1
grep '"metric"' "$LOGD/bench_emitd192.log" || tail -3 "$LOGD/bench_emitd192.log"

echo "=== bench EMIT_D=48 $(date +%T)"
DEEPCAM_FUSED_EMIT_D=48 python -u bench.py > "$LOGD/bench_emitd48.log" 2>&1
grep '"metric"' "$LOGD/bench_emitd48.log" || tail -3 "$LOGD/bench_emitd48.log"

echo "=== step trace (r4 final) $(date +%T)"
python -u scripts/step_trace.py 4 /tmp/xprof_r4g > "$LOGD/step_trace_r4final.log" 2>&1
tail -3 "$LOGD/step_trace_r4final.log"

echo "=== kernel audit (r4 final) $(date +%T)"
python -u scripts/kernel_audit.py /tmp/xprof_r4g 4 > "$LOGD/kernel_audit_r4final.log" 2>&1
tail -3 "$LOGD/kernel_audit_r4final.log"

echo "=== wave7 done $(date +%T)"
