"""Checkpoint round-trip tests (parity: train_hdf5_ddp.py:232-242,515-527)."""

import jax
import jax.numpy as jnp
import numpy as np

from deepcam_tpu.ckpt.checkpoint import (
    checkpoint_path,
    restore_checkpoint,
    save_checkpoint,
)
from deepcam_tpu.models.deeplab import DeepLabv3plus
from deepcam_tpu.train.optim import build_optimizer
from deepcam_tpu.train.trainer import create_train_state


def _tiny_state():
    """Small deterministic TrainState for writer tests."""
    from deepcam_tpu.train.trainer import TrainState

    tx = build_optimizer("Adam", 1e-3)
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    return TrainState(
        step=jnp.asarray(7, jnp.int32),
        params=params,
        batch_stats={"m": jnp.zeros((3,))},
        opt_state=tx.init(params),
    )


def test_checkpoint_roundtrip(tmp_path):
    model = DeepLabv3plus(n_classes=3, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 48, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tx = build_optimizer("Adam", 1e-3)
    state = create_train_state(model, variables, tx)
    state = state.replace(step=jnp.asarray(42, jnp.int32))

    path = checkpoint_path(str(tmp_path), "model", 42)
    assert path.endswith("model_step_42.cpt")
    save_checkpoint(path, state, epoch=3, process_index=0)

    # fresh template state with different values
    variables2 = model.init(jax.random.PRNGKey(1), x, train=False)
    state2 = create_train_state(model, variables2, tx)
    restored, epoch = restore_checkpoint(path, state2)

    assert epoch == 3
    assert int(restored.step) == 42
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nonzero_process_does_not_write(tmp_path):
    model = DeepLabv3plus(n_classes=3, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 48, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tx = build_optimizer("Adam", 1e-3)
    state = create_train_state(model, variables, tx)
    path = str(tmp_path / "nope.cpt")
    save_checkpoint(path, state, epoch=0, process_index=1)
    import os

    assert not os.path.exists(path)


def test_async_writer_matches_sync(tmp_path):
    """AsyncCheckpointWriter publishes the same bytes as save_checkpoint
    and wait() blocks until the file is on disk."""
    import os

    from deepcam_tpu.ckpt.checkpoint import (
        AsyncCheckpointWriter,
        restore_checkpoint,
        save_checkpoint,
    )

    state = _tiny_state()
    sync_path = os.path.join(str(tmp_path), "sync.cpt")
    async_path = os.path.join(str(tmp_path), "async.cpt")
    save_checkpoint(sync_path, state, epoch=3, process_index=0)

    w = AsyncCheckpointWriter(process_index=0)
    w.save(async_path, state, epoch=3)
    w.wait()
    assert os.path.exists(async_path)
    with open(sync_path, "rb") as a, open(async_path, "rb") as b:
        assert a.read() == b.read()

    restored, epoch = restore_checkpoint(async_path, _tiny_state())
    assert epoch == 3


def test_async_writer_nonzero_rank_writes_nothing(tmp_path):
    import os

    from deepcam_tpu.ckpt.checkpoint import AsyncCheckpointWriter

    w = AsyncCheckpointWriter(process_index=1)
    p = os.path.join(str(tmp_path), "x.cpt")
    w.save(p, _tiny_state(), epoch=0)
    w.wait()
    assert not os.path.exists(p)


def test_async_writer_surfaces_errors(tmp_path):
    import os

    import pytest

    from deepcam_tpu.ckpt.checkpoint import AsyncCheckpointWriter

    w = AsyncCheckpointWriter(process_index=0)
    bad = os.path.join(str(tmp_path), "no", "such", "dir", "x.cpt")
    w.save(bad, _tiny_state(), epoch=0)
    with pytest.raises(Exception):
        w.wait()
    w.wait()  # error is consumed; writer is reusable


def test_orbax_roundtrip_and_writer(tmp_path):
    """Orbax directory-format save/restore: same payload contract as the
    msgpack path, restore into a sharded template (8-dev replicated mesh),
    plus the async writer's publish-order wait()."""
    from deepcam_tpu.ckpt.orbax_ckpt import (
        OrbaxCheckpointWriter,
        restore_checkpoint_orbax,
    )
    from deepcam_tpu.core import mesh as meshlib

    model = DeepLabv3plus(n_classes=3, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 48, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tx = build_optimizer("Adam", 1e-3)
    state = create_train_state(model, variables, tx)
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    mesh = meshlib.make_mesh()
    state = jax.device_put(state, meshlib.replicated(mesh))

    path = str(tmp_path / "model_step_42.cpt")
    w = OrbaxCheckpointWriter()
    w.save(path, state, epoch=3)
    w.wait()
    import os

    assert os.path.isdir(path)  # directory format -> CLI restore auto-detect

    variables2 = model.init(jax.random.PRNGKey(1), x, train=False)
    state2 = create_train_state(model, variables2, tx)
    state2 = jax.device_put(state2, meshlib.replicated(mesh))
    restored, epoch = restore_checkpoint_orbax(path, state2)

    assert epoch == 3
    assert int(restored.step) == 42
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored arrays carry the template's sharding (distributed placement)
    leaf = jax.tree_util.tree_leaves(restored.params)[0]
    assert leaf.sharding.is_equivalent_to(
        meshlib.replicated(mesh), leaf.ndim)
