"""MLPerf-compliance logging with the exact ``:::MLLOG`` line contract.

Parity target: ``/root/reference/src/deepCam/utils/mlperf_log_utils.py`` and
the ``mlperf_logging.mllog`` package it wraps.  That package is not available
here, so this module emits the same wire format natively:

    :::MLLOG {"namespace": "", "time_ms": <int>, "event_type":
    "POINT_IN_TIME"|"INTERVAL_START"|"INTERVAL_END", "key": "...",
    "value": ..., "metadata": {"file": "...", "lineno": N}}

Behavioral parity:
* rank-0-only emission with optional ``log_all_ranks`` override
  (``mlperf_log_utils.py:92-105``);
* ``sync=True`` performs a global device barrier before timestamping —
  required for timed keys like run_start/run_stop (``:92-93,107-114``);
* the constructor emits the submission header (benchmark, org,
  division=closed, status=onprem, platform=<N>x placeholder, ``:55-68``)
  and creates the log directory on rank 0 (``:44-50``).
"""

from __future__ import annotations

import inspect
import json
import os
import time
from typing import Any, Optional

import jax


def _barrier():
    """Global device barrier: tiny psum across all devices + block."""
    try:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mlperf_log_barrier")
    except Exception:
        jax.block_until_ready(jax.numpy.zeros(()))


class MLPerfLogger:
    """Drop-in functional equivalent of the reference ``mlperf_logger``."""

    def __init__(
        self,
        filename: str,
        benchmark: str = "deepcam",
        organization: str = "deepcam_tpu",
        platform: Optional[str] = None,
        stdout: bool = False,
        barrier_fn=None,
    ):
        self.comm_rank = jax.process_index()
        self.comm_size = jax.process_count()
        self.filename = filename
        self.stdout = stdout
        self._barrier_fn = barrier_fn or _barrier
        self._fh = None

        logdir = os.path.dirname(filename)
        if self.comm_rank == 0 and logdir:
            os.makedirs(logdir, exist_ok=True)
        self.barrier()
        if self.comm_rank == 0:
            self._fh = open(filename, "a")

        self.log_event(key="submission_benchmark", value=benchmark)
        self.log_event(key="submission_org", value=organization)
        self.log_event(key="submission_division", value="closed")
        self.log_event(key="submission_status", value="onprem")
        self.log_event(
            key="submission_platform",
            value=platform or f"{self.comm_size}xSUBMISSION_PLATFORM_PLACEHOLDER",
        )

    # -- public API (parity with mlperf_logger.log_start/log_end/log_event) --

    def log_start(self, key: str, value: Any = None, metadata=None, sync=False):
        self._log("INTERVAL_START", key, value, metadata, sync)

    def log_end(self, key: str, value: Any = None, metadata=None, sync=False):
        self._log("INTERVAL_END", key, value, metadata, sync)

    def log_event(self, key: str, value: Any = None, metadata=None, sync=False):
        self._log("POINT_IN_TIME", key, value, metadata, sync)

    def barrier(self):
        self._barrier_fn()

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    # -- internals ----------------------------------------------------------

    def _log(self, event_type, key, value, metadata, sync, log_all_ranks=False):
        if sync:
            self.barrier()
        if not (log_all_ranks or self.comm_rank == 0):
            return
        caller = inspect.stack()[2]
        md = {"file": os.path.basename(caller.filename), "lineno": caller.lineno}
        if metadata:
            md.update(metadata)
        record = {
            "namespace": "",
            "time_ms": int(time.time() * 1000),
            "event_type": event_type,
            "key": key,
            "value": value,
            "metadata": md,
        }
        line = ":::MLLOG " + json.dumps(record)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.stdout:
            print(line)


def parse_mllog(path: str):
    """Parse an MLPerf log back into a list of dict records — the functional
    core of ``analysis/training_analysis.ipynb``'s ``parse_log``."""
    records = []
    with open(path) as f:
        for line in f:
            if line.startswith(":::MLLOG "):
                records.append(json.loads(line[len(":::MLLOG "):]))
    return records
