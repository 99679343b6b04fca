"""Round-3 wave 4: v2 kernel compile probe first (fast fail), then the v2
whole-model A/B, the row-tile sweep unlocked by the raised VMEM limit, and
eval_bench if wave 3 didn't reach it.  Same queue discipline."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    ("s2v2_probe", [sys.executable, "-u", "scripts/s2v2_compile_probe.py"], {}),
    ("fused_s2_v2", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_FUSED_S2": "2"}),
    ("th24", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_FUSED_TH": "24", "DEEPCAM_FUSED_VMEM_LIMIT_MB": "127"}),
    ("th48", [sys.executable, "-u", "bench.py"],
     {"DEEPCAM_FUSED_TH": "48", "DEEPCAM_FUSED_VMEM_LIMIT_MB": "127"}),
    ("eval_bench", [sys.executable, "-u", "scripts/eval_bench.py"], {}),
]


def main():
    results = {}
    skip_v2 = False
    for name, argv, env in JOBS:
        if name == "fused_s2_v2" and skip_v2:
            print("AB fused_s2_v2: SKIPPED (probe failed)", flush=True)
            continue
        e = dict(os.environ, **env)
        try:
            out = subprocess.run(argv, env=e, capture_output=True, text=True,
                                 timeout=5400, cwd=ROOT)
        except subprocess.TimeoutExpired:
            results[name] = "timeout"
            print(f"AB {name}: TIMEOUT — aborting remaining queue", flush=True)
            break
        if name == "s2v2_probe":
            print(out.stdout, flush=True)
            results[name] = out.returncode
            if out.returncode != 0:
                skip_v2 = True
            continue
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
            print(out.stderr[-3000:], file=sys.stderr, flush=True)
    print("AB_SUMMARY", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
