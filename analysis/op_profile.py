#!/usr/bin/env python
"""Per-op / per-category device-time report from an xprof trace.

The TPU replacement for the reference's nsight processing workflow
(``analysis/utils.py:54-123`` + ``process_nsight_deepcam.ipynb``): point it
at a trace file or the logdir given to ``jax.profiler.start_trace`` (e.g.
what ``deepcam_tpu.cli.profile`` or scripts/perf_breakdown.py captured) and
it prints the per-op table (Name, Time, Invocations, Time Avg, achieved
TFLOP/s, flop/byte) and the per-category rollup, per traced step.

Usage:
    python analysis/op_profile.py LOGDIR_OR_TRACE [--top N] [--total]
                                  [--csv out.csv]
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace", help="xprof logdir or *.trace.json.gz file")
    ap.add_argument("--top", type=int, default=30,
                    help="rows in the per-op table (default 30)")
    ap.add_argument("--total", action="store_true",
                    help="report totals over the trace instead of per-step")
    ap.add_argument("--csv", default=None,
                    help="also write the FULL per-op table to this CSV")
    pargs = ap.parse_args()

    import pandas as pd

    from deepcam_tpu.profiling.op_table import (
        category_table,
        load_device_ops,
        op_table,
        per_step,
    )

    ops = load_device_ops(pargs.trace)
    n_steps = ops.attrs["n_steps"]
    full = op_table(ops)
    cats = category_table(ops)
    if not pargs.total and n_steps > 0:
        full = per_step(full, n_steps)
        cats = per_step(cats, n_steps)
        scope = f"per step ({n_steps} traced)"
    else:
        scope = "trace total"

    if pargs.csv:
        full.to_csv(pargs.csv)

    with pd.option_context("display.width", 200, "display.max_rows", 300,
                           "display.float_format", "{:.3f}".format):
        print(f"== device time by hlo_category [{scope}] "
              f"(total {cats['time_ms'].sum():.2f} ms)")
        print(cats.to_string())
        print(f"\n== top {pargs.top} ops by device time [{scope}]")
        print(full.head(pargs.top).to_string())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
