#!/bin/bash
# Round-3 final-session serialized TPU queue (one chip, one client at a time).
# Waits for the v2 compile probe (PID $1) to finish, then:
#   1. bench control at current defaults (also warms the driver's final-bench cache)
#   2. FUSED_S2=2 arm IF the probe passed
#   3. DEEPCAM_FUSED_MAX_DIL=1 arm (exit-flow dilation-2 sepconvs to XLA)
#   4. eval-path hardware bench (VERDICT item 4)
# Never kills a child (relay wedge); each stage logs to /tmp.
set -u
cd /root/repo
PROBE_PID=${1:-}
if [ -n "$PROBE_PID" ]; then
  while kill -0 "$PROBE_PID" 2>/dev/null; do sleep 5; done
fi
probe_ok=1
grep -q "PROBE.*FAIL" /tmp/s2v2_probe.log && probe_ok=0
grep -q "Traceback" /tmp/s2v2_probe.log && probe_ok=0
grep -q "PROBE" /tmp/s2v2_probe.log || probe_ok=0
echo "probe_ok=$probe_ok"

echo "=== bench control $(date +%T)"
python -u bench.py > /tmp/bench_control.log 2>&1
grep '"metric"' /tmp/bench_control.log

if [ "$probe_ok" = 1 ]; then
  echo "=== bench FUSED_S2=2 $(date +%T)"
  DEEPCAM_FUSED_S2=2 python -u bench.py > /tmp/bench_s2v2.log 2>&1
  grep '"metric"' /tmp/bench_s2v2.log
fi

echo "=== bench dil2_xla $(date +%T)"
DEEPCAM_FUSED_MAX_DIL=1 python -u bench.py > /tmp/bench_dil2.log 2>&1
grep '"metric"' /tmp/bench_dil2.log

echo "=== eval bench $(date +%T)"
python -u scripts/eval_bench.py > /tmp/eval_bench.log 2>&1
grep '"eval' /tmp/eval_bench.log

echo "=== queue done $(date +%T)"
