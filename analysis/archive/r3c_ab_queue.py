"""Round-3 wave 3: confirm the counterintuitive iou0 slowdown with an
A/B/A bracket, the VMEM-fixed fused_s2 v2, and the MIN_ROWS exit-flow gate.

Same discipline: fresh subprocess per config; abort queue on timeout."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    ("iou1_a", [sys.executable, "-u", "bench.py"], {"BENCH_IOU": "1"}),
    ("iou0_b", [sys.executable, "-u", "bench.py"], {}),
    ("iou1_c", [sys.executable, "-u", "bench.py"], {"BENCH_IOU": "1"}),
    ("iou0_pin", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_PIN_LOGITS": "1"}),
    ("fused_s2_v2", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_FUSED_S2": "2", "BENCH_IOU": "1"}),
    ("min_rows_32", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_FUSED_MIN_ROWS": "32", "BENCH_IOU": "1"}),
    ("eval_bench", [sys.executable, "-u", "scripts/eval_bench.py"], {}),
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
        if name == "eval_bench":
            results[name] = lines
            print("EVAL_BENCH:\n" + "\n".join(lines), flush=True)
            if not lines:
                print(out.stderr[-3000:], file=sys.stderr, flush=True)
            continue
        val = json.loads(lines[-1])["value"] if lines else None
        results[name] = val
        print(f"AB {name}: {val}", flush=True)
        if val is None:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr, flush=True)
    print("AB_SUMMARY", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
