"""Per-op trace-analysis tool (profiling/op_table.py) on a fabricated
Chrome-trace fixture with the xprof "XLA Ops"/"Steps" track shape —
the nsight-processing analogue (reference analysis/utils.py:54-123)."""

import gzip
import json
import os

import numpy as np
import pytest

from deepcam_tpu.profiling.op_table import (
    category_table,
    find_trace,
    load_device_ops,
    op_table,
    per_step,
)


def _write_trace(root):
    run = os.path.join(root, "plugins", "profile", "2026_01_01_00_00_00")
    os.makedirs(run)
    pid = 3
    events = [
        {"ph": "M", "pid": pid, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": pid, "tid": 1, "name": "thread_name",
         "args": {"name": "Steps"}},
        {"ph": "M", "pid": pid, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 9, "tid": 7, "name": "thread_name",
         "args": {"name": "host junk"}},
    ]
    # 2 traced steps
    for i in range(2):
        events.append({"ph": "X", "pid": pid, "tid": 1, "name": str(i),
                       "ts": 1000.0 * i, "dur": 900.0})
    # per step: one conv fusion (2 ms, 4e9 flops), two copies (0.5 ms each)
    for i in range(2):
        events.append({
            "ph": "X", "pid": pid, "tid": 2, "name": "fusion.1",
            "ts": 1000.0 * i, "dur": 2000.0,
            "args": {"device_duration_ps": 2e9, "model_flops": 4e9,
                     "bytes_accessed": 1e6,
                     "hlo_category": "convolution fusion"},
        })
        for j in range(2):
            events.append({
                "ph": "X", "pid": pid, "tid": 2, "name": f"copy.{j}",
                "ts": 1000.0 * i + 500 + j, "dur": 500.0,
                "args": {"device_duration_ps": 5e8, "model_flops": 0,
                         "bytes_accessed": 2e6, "hlo_category": "copy"},
            })
    # a host event that must be ignored
    events.append({"ph": "X", "pid": 9, "tid": 7, "name": "python",
                   "ts": 0, "dur": 1e6})
    path = os.path.join(run, "vm.trace.json.gz")
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)
    return path


@pytest.fixture()
def trace_dir(tmp_path):
    _write_trace(str(tmp_path))
    return str(tmp_path)


def test_find_trace_resolves_logdir(trace_dir):
    p = find_trace(trace_dir)
    assert p.endswith(".trace.json.gz")
    assert find_trace(p) == p  # idempotent on the file itself


def test_op_and_category_tables(trace_dir):
    ops = load_device_ops(trace_dir)
    assert ops.attrs["n_steps"] == 2
    assert len(ops) == 6  # 2 steps x (1 fusion + 2 copies); host excluded

    table = op_table(ops)
    assert list(table.index[:1]) == ["fusion.1"]  # sorted by time
    f = table.loc["fusion.1"]
    assert f["invocations"] == 2
    np.testing.assert_allclose(f["time_ms"], 4.0)      # 2 x 2 ms
    np.testing.assert_allclose(f["time_avg_ms"], 2.0)
    np.testing.assert_allclose(f["tflops"], 8e9 / 4e-3 / 1e12)

    cats = category_table(ops)
    np.testing.assert_allclose(cats.loc["copy", "time_ms"], 2.0)
    np.testing.assert_allclose(
        cats["time_pct"].sum(), 100.0, rtol=1e-6)

    stepped = per_step(table, ops.attrs["n_steps"])
    np.testing.assert_allclose(stepped.loc["fusion.1", "time_ms"], 2.0)
    np.testing.assert_allclose(stepped.loc["fusion.1", "invocations"], 1.0)


def test_cli_runs(trace_dir, capsys):
    import subprocess, sys, os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "analysis", "op_profile.py"),
         trace_dir, "--top", "5"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "hlo_category" in out.stdout or "device time" in out.stdout
    assert "fusion.1" in out.stdout
