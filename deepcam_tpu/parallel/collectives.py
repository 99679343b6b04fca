"""Collective helpers.

The reference's explicit collective surface (SURVEY.md §2.4):
``dist.broadcast`` (step/epoch), ``dist.reduce(SUM→0)`` (train loss/IoU),
``dist.all_reduce(SUM)`` (eval count/loss/IoU), ``dist.barrier`` (timed log
keys), plus DDP's gradient allreduce.  In this stack the gradient reduction
lives inside the jitted step (``lax.pmean`` in train/trainer.py) and the
scalar reductions are psum'd in the same program; what remains are host-level
utilities for multi-process coordination, built on XLA collectives — no
NCCL/MPI.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def barrier(name: str = "barrier") -> None:
    """Global barrier across all processes (parity: dist.barrier /
    mlperf barrier, mlperf_log_utils.py:107-114)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def broadcast_from_host0(value: Any) -> Any:
    """Broadcast a small host value from process 0 to all processes
    (parity: the step/epoch tensor broadcast, train_hdf5_ddp.py:263-272)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(value)


def allreduce_sum_scalar(x: float) -> float:
    """Sum a host scalar over all processes (parity: dist.all_reduce SUM of
    eval accumulators, train_hdf5_ddp.py:490-492)."""
    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray(x, np.float64))
    return float(np.sum(arr))
