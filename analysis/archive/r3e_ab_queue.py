"""Round-3 wave 5: a fresh control at current defaults, the dilation-gate
A/B (exit-flow d=2 units to XLA — MIN_ROWS could never isolate them, both
exit and middle flow are 48 rows), and the stats_inkernel re-test that
wave 2 queued but never reached.  Same queue discipline: fresh subprocess
per config; on timeout abort the remaining queue (a killed TPU client can
wedge the relay and poison later results)."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    ("control", [sys.executable, "-u", "bench.py"], {}),
    ("dil2_xla", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_FUSED_MAX_DIL": "1"}),
    ("stats_inkernel", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_STATS_INKERNEL": "1"}),
]


def main():
    results = {}
    for name, argv, env in JOBS:
        e = dict(os.environ, **env)
        try:
            out = subprocess.run(argv, env=e, capture_output=True, text=True,
                                 timeout=5400, cwd=ROOT)
        except subprocess.TimeoutExpired:
            results[name] = "timeout"
            print(f"AB {name}: TIMEOUT — aborting remaining queue", flush=True)
            break
        lines = [l for l in out.stdout.splitlines()
                 if l.startswith('{"metric"')]
        val = json.loads(lines[-1])["value"] if lines else None
        results[name] = val
        print(f"AB {name}: {val}", flush=True)
        if val is None:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-3000:], file=sys.stderr, flush=True)
    print("AB_SUMMARY", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
