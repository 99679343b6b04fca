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

``AsyncCheckpointWriter`` removes the save stall from the step loop: the
synchronous path device_gets ~0.5 GB through the host every
``save_frequency`` steps; the async writer snapshots the (immutable) device
arrays and runs the fetch + serialize + atomic-rename on a worker thread,
so training continues while the previous checkpoint drains.  One in-flight
save at a time (a newer save waits for the older, preserving publish
order); ``wait()`` drains the queue at run end and re-raises worker errors.
"""

from __future__ import annotations

import os
import threading
from typing import Any, Optional, Tuple

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


class AsyncCheckpointWriter:
    """Background-thread checkpoint writer (one in-flight save).

    JAX arrays are immutable, so snapshotting the state pytree by reference
    is safe even though training keeps stepping (donated buffers produce
    NEW arrays; the captured ones are left intact until the fetch
    completes).  The worker performs the same device_get + msgpack +
    atomic-rename as ``save_checkpoint``.
    """

    def __init__(self, process_index: Optional[int] = None):
        self._proc = (
            jax.process_index() if process_index is None else process_index
        )
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def save(self, path: str, state: TrainState, epoch: int) -> None:
        if self._proc != 0:
            return
        self.wait()  # one in-flight save; keeps publish order

        def work():
            try:
                save_checkpoint(path, state, epoch, process_index=0)
            except BaseException as e:  # surfaced by wait()
                self._error = e

        self._thread = threading.Thread(
            target=work, name="ckpt-writer", daemon=True
        )
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight save (if any) has published; re-raise
        any worker failure."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


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
