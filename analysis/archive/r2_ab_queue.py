"""Sequential bench A/B queue for the round-2 gated experiments.

Runs bench.py in-process-equivalent configs one after another (each a
fresh subprocess so env gating is clean) and prints one line per config.
Run in background with a generous timeout; each config's first compile
can take minutes on the relay.
"""

import json
import os
import subprocess
import sys

# Ordered by expected value: if wall-clock cuts the run, the tail configs
# are the ones we can afford to lose.
CONFIGS = [
    ("defaults", {}),
    ("fused_s2", {"DEEPCAM_FUSED_S2": "1"}),
    ("nopad", {"DEEPCAM_FUSED_NOPAD": "1"}),
    ("split_concat", {"DEEPCAM_SPLIT_CONCAT": "1"}),
    ("tail_blocks", {"DEEPCAM_TAIL_BLOCKS": "1"}),
    # b6 OOM'd by only 37 MB at defaults (PERF.md W-halo note); nopad drops
    # the H-padded operand copies, which may be enough without remat.
    ("b6_nopad", {"BENCH_LOCAL_BATCH": "6", "DEEPCAM_FUSED_NOPAD": "1"}),
    ("nopad+tail", {"DEEPCAM_FUSED_NOPAD": "1", "DEEPCAM_TAIL_BLOCKS": "1"}),
    ("nopad+inkernel", {"DEEPCAM_FUSED_NOPAD": "1",
                        "DEEPCAM_STATS_INKERNEL": "1"}),
    ("bn_onepass", {"DEEPCAM_BN_ONEPASS": "1"}),
    ("atrous_s2b", {"DEEPCAM_ATROUS": "s2b"}),
    # Batch-scaling arm: remat trades recompute for HBM so batch 6/8 fit
    # (b8 OOM'd at 16.7 vs 15.75 GB without remat, PERF.md).
    ("b6_remat", {"BENCH_LOCAL_BATCH": "6", "BENCH_REMAT": "1"}),
    ("b8_remat", {"BENCH_LOCAL_BATCH": "8", "BENCH_REMAT": "1"}),
]


def main():
    # cheap standalone validation of the new stride-2 kernel first (small
    # graphs, fast compile) so Mosaic lowering issues surface before the
    # full-model configs spend their compile budget
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        pre = subprocess.run(
            [sys.executable, "-u", "scripts/s2_kernel_ab.py"],
            capture_output=True, text=True, timeout=3600, cwd=root,
        )
        print("S2_KERNEL_AB:\n" + pre.stdout, flush=True)
        if pre.returncode != 0:
            print(pre.stderr[-3000:], file=sys.stderr, flush=True)
    except subprocess.TimeoutExpired:
        print("S2_KERNEL_AB: TIMEOUT", flush=True)
    results = {}
    for name, env in CONFIGS:
        e = dict(os.environ, **env)
        try:
            out = subprocess.run(
                [sys.executable, "-u", "bench.py"], env=e,
                # generous: killing a client mid-compile wedges the relay
                # (memory note axon-relay-wedge); new graphs compile minutes
                capture_output=True, text=True, timeout=5400,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith('{"metric"')]
            val = json.loads(line[-1])["value"] if line else None
            results[name] = val
            print(f"AB {name}: {val}", flush=True)
            if val is None:
                print(out.stdout[-2000:], file=sys.stderr)
                print(out.stderr[-2000:], file=sys.stderr)
        except subprocess.TimeoutExpired:
            results[name] = "timeout"
            print(f"AB {name}: TIMEOUT", flush=True)
    print("AB_SUMMARY", json.dumps(results), flush=True)

    # Auto-combine: union of every single-knob config that beat defaults
    # by >1%, run as one final config (skip batch-scaling arms — they
    # change the operating point, not the schedule).
    base = results.get("defaults")
    if isinstance(base, (int, float)) and base:
        combo_env = {}
        for name, env in CONFIGS:
            if name.startswith("b6") or name.startswith("b8"):
                continue
            v = results.get(name)
            if isinstance(v, (int, float)) and v > base * 1.01:
                combo_env.update(env)
        if len(combo_env) > 1:
            e = dict(os.environ, **combo_env)
            try:
                out = subprocess.run(
                    [sys.executable, "-u", "bench.py"], env=e,
                    capture_output=True, text=True, timeout=5400,
                    cwd=os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__))),
                )
                line = [l for l in out.stdout.splitlines()
                        if l.startswith('{"metric"')]
                val = json.loads(line[-1])["value"] if line else None
                print(f"AB combo {sorted(combo_env)}: {val}", flush=True)
            except subprocess.TimeoutExpired:
                print("AB combo: TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
