#!/bin/bash
# Round-4 wave-12: re-test two opt-in verdicts that date from r2-era
# defaults on the r4-final graph (EMIT_D=48 + boundary fold + s2d input
# feed).  Precedent: MAX_DIL and the EMIT_D middle-flow prediction both
# INVERTED when re-measured at newer defaults; these two are the last
# rows whose numbers predate BLOCK_LOSS:
#   - DEEPCAM_DECONV3=d2s     (r2: 19.76 vs 20.30, pre-block-loss)
#   - DEEPCAM_TAIL_BLOCKS=1   (r2: 22.18 vs 22.73, pre-boundary-fold)
# Control for this session: bench_control7.log (launched first).
set -u
cd /root/repo
LOGD=analysis/r4_queue

echo "=== deconv3=d2s retest $(date +%T)"
DEEPCAM_DECONV3=d2s timeout 1200 python -u bench.py \
  > "$LOGD/bench_deconv3_d2s.log" 2>&1
grep '"metric"' "$LOGD/bench_deconv3_d2s.log" || tail -3 "$LOGD/bench_deconv3_d2s.log"

echo "=== tail_blocks retest $(date +%T)"
DEEPCAM_TAIL_BLOCKS=1 timeout 1200 python -u bench.py \
  > "$LOGD/bench_tailblocks.log" 2>&1
grep '"metric"' "$LOGD/bench_tailblocks.log" || tail -3 "$LOGD/bench_tailblocks.log"

echo "=== wave12 done $(date +%T)"
