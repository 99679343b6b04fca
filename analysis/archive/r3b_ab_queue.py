"""Round-3 wave 2: A/Bs after flipping BN_ONEPASS default-on and fixing the
fused_s2 v2 Mosaic lowering.

Jobs (EV order): reproduce control with per-step IoU (comparable to wave 1's
23.93 bn_onepass), the no-IoU hot step (reference parity — IoU lives in the
logging branch), fused_s2 v2 (in-kernel phase split, gather-free), v2 at
th=8, stats_inkernel stacking, and the eval-pass timing sweep.

Same discipline as r3_ab_queue: fresh subprocess per config, never kill a
TPU child mid-run; on timeout abort the remaining queue.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    ("iou1_control", [sys.executable, "-u", "bench.py"], {"BENCH_IOU": "1"}),
    ("iou0_hotstep", [sys.executable, "-u", "bench.py"], {}),
    ("fused_s2_v2", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_FUSED_S2": "2"}),
    ("fused_s2_v2_th8", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_FUSED_S2": "2", "DEEPCAM_FUSED_S2_TH": "8"}),
    ("stats_inkernel", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_STATS_INKERNEL": "1"}),
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
            print(f"AB {name}: TIMEOUT — aborting remaining queue "
                  f"(relay state suspect after a killed TPU client)",
                  flush=True)
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
