"""Per-op device-time tables from an xprof trace — the TPU-native analogue
of the reference's nsight kernel pipeline.

Parity targets:
* ``/root/reference/analysis/utils.py:84-123`` (``import_nsight_overview``:
  per-kernel {Name, Time, Invocations, Time Avg} from the nsys sqlite) and
  ``:54-81`` (``import_nsight_metric``: per-kernel metric means from
  nv-nsight-cu CSV);
* ``/root/reference/analysis/process_nsight_deepcam.ipynb`` — the notebook
  that aggregates those into per-op and per-category tables.

TPU source of truth: the Chrome-trace export xprof writes next to the
xplane (``plugins/profile/<run>/<host>.trace.json.gz``) when a device trace
is captured via ``jax.profiler.start_trace`` (profiling/profiler.py or
``cli/profile.py``).  Its "XLA Ops" track carries, per op instance, the
device duration, ``hlo_category``, ``model_flops`` and ``bytes_accessed``
— i.e. nsight's timeline AND metric tables in one artifact, so one loader
replaces both reference importers.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from typing import Optional

import pandas as pd


def find_trace(path: str) -> str:
    """Resolve ``path`` to a concrete ``*.trace.json.gz``.

    Accepts the trace file itself, an xprof logdir (the argument given to
    ``jax.profiler.start_trace``), or any ancestor of the run directory;
    picks the newest run when several exist.
    """
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return hits[-1]


def load_device_ops(path: str) -> pd.DataFrame:
    """One row per device-op *instance* from the trace's "XLA Ops" tracks.

    Columns: name, category, time_ms (device time), flops, bytes.
    ``attrs['n_steps']`` carries the number of traced steps (from the
    "Steps" track) for per-step normalization; 0 when absent.
    """
    with gzip.open(find_trace(path), "rt") as f:
        events = json.load(f)["traceEvents"]

    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e["tid"])] = e["args"]["name"]

    rows = []
    n_steps = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        track = thread_names.get((e.get("pid"), e.get("tid")))
        if track == "Steps":
            n_steps += 1
            continue
        if track != "XLA Ops":
            continue
        args = e.get("args", {})
        dur_ps = float(args.get("device_duration_ps", 0.0))
        # model-scope attribution, e.g. "jit(step)/.../upsample/deconv3/..."
        scope = (args.get("tf_op") or "").strip().rstrip(":")
        rows.append(
            (
                e["name"],
                args.get("hlo_category", "unknown"),
                (dur_ps * 1e-9) if dur_ps else float(e.get("dur", 0.0)) * 1e-3,
                float(args.get("model_flops", 0.0) or 0.0),
                float(args.get("bytes_accessed", 0.0) or 0.0),
                scope,
            )
        )
    df = pd.DataFrame(
        rows, columns=["name", "category", "time_ms", "flops", "bytes",
                       "scope"]
    )
    df.attrs["n_steps"] = n_steps
    return df


def op_table(ops: pd.DataFrame, top: Optional[int] = None) -> pd.DataFrame:
    """Aggregate per op name — the ``import_nsight_overview`` table shape
    ({Name, Time, Invocations, Time Avg}) plus roofline columns (achieved
    TFLOP/s and flop/byte from the per-op counters)."""
    g = ops.groupby("name", sort=False)
    out = pd.DataFrame(
        {
            "category": g["category"].first(),
            "time_ms": g["time_ms"].sum(),
            "invocations": g.size(),
            "flops": g["flops"].sum(),
            "bytes": g["bytes"].sum(),
        }
    )
    out["time_avg_ms"] = out["time_ms"] / out["invocations"]
    secs = out["time_ms"].clip(lower=1e-9) / 1e3
    out["tflops"] = out["flops"] / secs / 1e12
    out["flop_per_byte"] = out["flops"] / out["bytes"].clip(lower=1.0)
    out = out.sort_values("time_ms", ascending=False)
    return out.head(top) if top else out


def category_table(ops: pd.DataFrame) -> pd.DataFrame:
    """Roll up by ``hlo_category`` (the PERF.md-style device-time
    composition: fusions / copies / slices / convolutions / ...)."""
    g = ops.groupby("category", sort=False)
    out = pd.DataFrame(
        {
            "time_ms": g["time_ms"].sum(),
            "invocations": g.size(),
            "flops": g["flops"].sum(),
            "bytes": g["bytes"].sum(),
        }
    )
    total = out["time_ms"].sum()
    out["time_pct"] = 100.0 * out["time_ms"] / max(total, 1e-9)
    return out.sort_values("time_ms", ascending=False)


def scope_table(ops: pd.DataFrame, depth: int = 3) -> pd.DataFrame:
    """Roll up by model scope (the HLO ``tf_op`` metadata, e.g.
    ``jit(step)/transpose(jvp(DeepLabv3plus))/upsample/deconv3/...``),
    truncated to ``depth`` path components after the jit root — a
    per-module device-time attribution no nsight analogue offered."""
    def trunc(s: str) -> str:
        if not s:
            return "(unattributed)"
        parts = s.split("/")
        return "/".join(parts[1:1 + depth]) or parts[0]

    g = ops.assign(module=ops["scope"].map(trunc)).groupby("module",
                                                           sort=False)
    out = pd.DataFrame(
        {
            "time_ms": g["time_ms"].sum(),
            "invocations": g.size(),
            "flops": g["flops"].sum(),
            "bytes": g["bytes"].sum(),
        }
    )
    total = out["time_ms"].sum()
    out["time_pct"] = 100.0 * out["time_ms"] / max(total, 1e-9)
    return out.sort_values("time_ms", ascending=False)


def per_step(table: pd.DataFrame, n_steps: int) -> pd.DataFrame:
    """Normalize an op/category table to per-step values."""
    if n_steps <= 0:
        return table
    out = table.copy()
    for col in ("time_ms", "flops", "bytes", "invocations"):
        if col in out:
            out[col] = out[col] / n_steps
    return out
