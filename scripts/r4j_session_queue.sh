#!/bin/bash
# Round-4 wave-10: re-test the no-IoU hot step at the r4-final graph
# (the r3 inversion — IoU-on measured FASTER — may not survive the
# boundary-fold + EMIT_D graph changes).
set -u
cd /root/repo
LOGD=analysis/r4_queue
echo "=== bench BENCH_IOU=0 $(date +%T)"
BENCH_IOU=0 python -u bench.py > "$LOGD/bench_noiou.log" 2>&1
grep '"metric"' "$LOGD/bench_noiou.log" || tail -3 "$LOGD/bench_noiou.log"
echo "=== wave10 done $(date +%T)"
