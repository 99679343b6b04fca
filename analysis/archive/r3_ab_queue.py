"""Round-3 sequential TPU queue: control bench, fresh full-step trace at the
new defaults (round3_plan.md priority 1), then the queued A/B verdicts that
round 2's window could not harvest (priority 4).

Each config is a fresh subprocess (clean env gating); never kill a child
mid-run (axon relay wedge — see PERF.md operational note).  EV ordering:
wall-clock cuts only the tail.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, argv, env) — bench configs print the one-line JSON; the trace
# prints its tables (recorded verbatim for PERF.md).
JOBS = [
    ("defaults", [sys.executable, "-u", "bench.py"], {}),
    ("step_trace", [sys.executable, "-u", "scripts/step_trace.py", "4"], {}),
    ("fused_s2_v2", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_FUSED_S2": "2"}),
    ("stats_inkernel", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_STATS_INKERNEL": "1"}),
    ("bn_onepass", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_BN_ONEPASS": "1"}),
    ("b6_remat", [sys.executable, "-u", "bench.py"],
     {"BENCH_LOCAL_BATCH": "6", "BENCH_REMAT": "1"}),
    ("atrous_s2b", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_ATROUS": "s2b"}),
    ("b8_remat", [sys.executable, "-u", "bench.py"],
     {"BENCH_LOCAL_BATCH": "8", "BENCH_REMAT": "1"}),
]


def main():
    results = {}
    for name, argv, env in JOBS:
        e = dict(os.environ, **env)
        try:
            out = subprocess.run(argv, env=e, capture_output=True, text=True,
                                 timeout=5400, cwd=ROOT)
        except subprocess.TimeoutExpired:
            # subprocess.run has already killed the child — the relay may now
            # be wedged, so every subsequent result would be untrustworthy.
            # Abort the rest of the queue instead of reporting garbage.
            results[name] = "timeout"
            print(f"AB {name}: TIMEOUT — aborting remaining queue "
                  f"(relay state suspect after a killed TPU client)",
                  flush=True)
            break
        if name == "step_trace":
            print(f"=== TRACE ===\n{out.stdout}\n=== /TRACE ===", flush=True)
            if out.returncode != 0:
                print(out.stderr[-3000:], file=sys.stderr, flush=True)
            continue
        line = [l for l in out.stdout.splitlines()
                if l.startswith('{"metric"')]
        val = json.loads(line[-1])["value"] if line else None
        results[name] = val
        print(f"AB {name}: {val}", flush=True)
        if val is None:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr, flush=True)
    print("AB_SUMMARY", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
