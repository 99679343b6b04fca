#!/bin/bash
# Round-4 wave-11: host-side s2d input feed A/B.
set -u
cd /root/repo
LOGD=analysis/r4_queue
echo "=== bench S2D_INPUT=1 $(date +%T)"
DEEPCAM_S2D_INPUT=1 python -u bench.py > "$LOGD/bench_s2din.log" 2>&1
grep '"metric"' "$LOGD/bench_s2din.log" || tail -3 "$LOGD/bench_s2din.log"
echo "=== bench control6 $(date +%T)"
python -u bench.py > "$LOGD/bench_control6.log" 2>&1
grep '"metric"' "$LOGD/bench_control6.log"
echo "=== wave11 done $(date +%T)"
