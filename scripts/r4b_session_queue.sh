#!/bin/bash
# Round-4 wave-2 serialized TPU session: runs AFTER r4_session_queue.sh.
#   1. xprof step trace at the (possibly updated) defaults
#   2. kernel_audit.py per-family roofline table from that trace
# Any default flips from wave-1 winners should be committed BEFORE this
# runs so the trace reflects the new defaults.
set -u
cd /root/repo
LOGD=analysis/r4_queue
mkdir -p "$LOGD"

echo "=== step trace $(date +%T)"
python -u scripts/step_trace.py 4 /tmp/xprof_r4 > "$LOGD/step_trace.log" 2>&1
tail -5 "$LOGD/step_trace.log"

echo "=== kernel audit $(date +%T)"
python -u scripts/kernel_audit.py /tmp/xprof_r4 4 > "$LOGD/kernel_audit.log" 2>&1
tail -3 "$LOGD/kernel_audit.log"

echo "=== wave2 done $(date +%T)"
