"""Checkpoint save/restore.

Parity target: ``/root/reference/src/deepCam/train_hdf5_ddp.py:232-242,
515-527`` — rank 0 writes ``{step, epoch, model, optimizer}`` every
``save_frequency`` steps as ``<prefix>_step_<N>.cpt``; restore loads the same
file on all ranks and rebuilds the scheduler from ``step``.

TPU-native shape: the state is a pure pytree (params / batch_stats /
opt_state), serialized with flax msgpack.  Process 0 writes; every process
reads the same file (all state is replicated under data parallelism, so this
is exact).  There is no apex-amp state: bf16 needs no loss scale.  The LR
schedule is a pure function of ``step``, so no scheduler state is saved
(SURVEY.md §2.3.10).
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import numpy as np
from flax import serialization

from ..train.trainer import TrainState


def checkpoint_path(output_dir: str, model_prefix: str, step: int) -> str:
    """``<output_dir>/<prefix>_step_<N>.cpt`` (train_hdf5_ddp.py:526)."""
    return os.path.join(output_dir, f"{model_prefix}_step_{step}.cpt")


def save_checkpoint(
    path: str, state: TrainState, epoch: int, process_index: int | None = None
) -> None:
    """Write the checkpoint from process 0 (parity: rank-0-only save)."""
    if process_index is None:
        process_index = jax.process_index()
    if process_index != 0:
        return
    payload = {
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    blob = serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic publish


def restore_checkpoint(path: str, state: TrainState) -> Tuple[TrainState, int]:
    """Load a checkpoint into an existing (template) state.

    Returns ``(state, epoch)``.  All processes read the same file, like the
    reference's all-rank ``torch.load`` (:232-239).
    """
    with open(path, "rb") as f:
        blob = f.read()
    template = {
        "step": np.asarray(state.step),
        "epoch": np.asarray(0),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    payload = serialization.from_bytes(template, blob)
    new_state = state.replace(
        step=jax.numpy.asarray(payload["step"]),
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"],
    )
    return new_state, int(payload["epoch"])
