#!/bin/bash
# Round-4 wave-13: hardware A/B of DEEPCAM_FUSED_ROLL=1 (tap shifts as
# pltpu.roll sublane rotates instead of zero-block concats — round-5
# plan P1).  Interpret parity + local AOT Mosaic lowering pass; per the
# r3 lesson only a server-side compile is conclusive, so this arm is
# both the compile probe and the whole-model A/B.
# Control: bench_control7.log (25.06, same session).
set -u
cd /root/repo
LOGD=analysis/r4_queue

echo "=== fused_roll arm $(date +%T)"
DEEPCAM_FUSED_ROLL=1 timeout 1200 python -u bench.py \
  > "$LOGD/bench_roll.log" 2>&1
grep '"metric"' "$LOGD/bench_roll.log" || tail -3 "$LOGD/bench_roll.log"
echo "=== wave13 done $(date +%T)"
