#!/bin/bash
# Round-4 wave-2 serialized TPU session: runs AFTER r4_session_queue.sh
# and after the wave-1 default flips (STATS_INKERNEL on, s2 family
# deleted) were committed.
#   1. bench control at the NEW defaults (graph cached from the wave-1
#      inkernel arm — fast)
#   2. DEEPCAM_BOUNDARY_FOLD=1 arm (first hardware compile of the
#      boundary kernel — a server-side Mosaic failure shows up here)
#   3. xprof step trace at the defaults
#   4. kernel_audit.py per-family roofline table from that trace
set -u
cd /root/repo
LOGD=analysis/r4_queue
mkdir -p "$LOGD"

echo "=== bench control (new defaults) $(date +%T)"
python -u bench.py > "$LOGD/bench_control2.log" 2>&1
grep '"metric"' "$LOGD/bench_control2.log"

echo "=== bench BOUNDARY_FOLD=1 $(date +%T)"
DEEPCAM_BOUNDARY_FOLD=1 python -u bench.py > "$LOGD/bench_boundary.log" 2>&1
grep '"metric"' "$LOGD/bench_boundary.log" || tail -3 "$LOGD/bench_boundary.log"

echo "=== step trace $(date +%T)"
python -u scripts/step_trace.py 4 /tmp/xprof_r4 > "$LOGD/step_trace.log" 2>&1
tail -5 "$LOGD/step_trace.log"

echo "=== kernel audit $(date +%T)"
python -u scripts/kernel_audit.py /tmp/xprof_r4 4 > "$LOGD/kernel_audit.log" 2>&1
tail -3 "$LOGD/kernel_audit.log"

echo "=== wave2 done $(date +%T)"
