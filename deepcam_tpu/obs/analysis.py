"""Post-hoc analysis of MLPerf training logs.

Capability parity with ``/root/reference/analysis/training_analysis.ipynb``
(``parse_log`` / ``process_line`` cells) and ``analysis/utils.py`` — parse
``:::MLLOG`` runs into structured tables, extract loss/accuracy curves vs
time/step, and report whether/when ``target_accuracy_reached`` fired.  Works
on plain dicts (pandas optional).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from .mlperf_log import parse_mllog


def extract_series(records: List[dict], key: str):
    """[(time_ms, step_num, value)] for every event of ``key``."""
    out = []
    for r in records:
        if r["key"] == key:
            out.append(
                (
                    r["time_ms"],
                    r.get("metadata", {}).get("step_num"),
                    r.get("value"),
                )
            )
    return out


def run_summary(path: str) -> Dict:
    """Summary of a training run log: wall time, curves, convergence."""
    records = parse_mllog(path)
    by_key: Dict[str, List[dict]] = {}
    for r in records:
        by_key.setdefault(r["key"], []).append(r)

    def first_time(key):
        return by_key[key][0]["time_ms"] if key in by_key else None

    run_start = first_time("run_start")
    run_stop = first_time("run_stop")
    target = by_key.get("target_accuracy_reached")

    summary = {
        "run_start_ms": run_start,
        "run_stop_ms": run_stop,
        "wall_seconds": (run_stop - run_start) / 1e3
        if run_start and run_stop
        else None,
        "train_loss": extract_series(records, "train_loss"),
        "train_accuracy": extract_series(records, "train_accuracy"),
        "eval_loss": extract_series(records, "eval_loss"),
        "eval_accuracy": extract_series(records, "eval_accuracy"),
        "learning_rate": extract_series(records, "learning_rate"),
        "global_batch_size": by_key.get("global_batch_size", [{}])[0].get("value"),
        "target_accuracy_reached": bool(target),
        "target_step": target[0].get("metadata", {}).get("step_num")
        if target
        else None,
        "epochs": len(by_key.get("epoch_start", [])),
    }
    return summary


def to_dataframe(path: str):
    """Full log as a pandas DataFrame (requires pandas)."""
    import pandas as pd

    records = parse_mllog(path)
    rows = []
    for r in records:
        row = {
            "time_ms": r["time_ms"],
            "event_type": r["event_type"],
            "key": r["key"],
            "value": r["value"],
        }
        row.update({f"md_{k}": v for k, v in r.get("metadata", {}).items()})
        rows.append(row)
    return pd.DataFrame(rows)
