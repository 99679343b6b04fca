"""Train/eval step tests on the 8-device virtual CPU mesh.

Uses the real DeepLabV3+ model at a tiny (32, 48) tile so a CPU step stays
tractable while exercising the full sharded path: shard_map, psum grads,
local-BN semantics, donated state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcam_tpu.core import mesh as meshlib
from deepcam_tpu.models.deeplab import DeepLabv3plus
from deepcam_tpu.train.losses import class_weights
from deepcam_tpu.train.optim import build_optimizer
from deepcam_tpu.train.trainer import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)


@pytest.fixture(scope="module")
def setup():
    model = DeepLabv3plus(n_classes=3, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 48, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(333), x, train=False)
    host_vars = jax.device_get(variables)  # keep a host copy: train steps
    tx = build_optimizer("AdamW", 1e-3, eps=1e-8, weight_decay=1e-2)  # donate
    mesh = meshlib.make_mesh(spatial=1)

    def fresh_state():
        return create_train_state(
            model, jax.tree_util.tree_map(jnp.asarray, host_vars), tx
        )

    return model, tx, fresh_state, mesh


def _batch(n, key=0):
    rng = np.random.RandomState(key)
    x = rng.randn(n, 32, 48, 16).astype(np.float32)
    y = rng.randint(0, 3, size=(n, 32, 48)).astype(np.int32)
    return jnp.asarray(x), jnp.asarray(y)


def test_train_step_runs_and_updates(setup):
    model, tx, fresh_state, mesh = setup
    state = fresh_state()
    assert len(jax.devices()) == 8
    w = list(class_weights())
    step_fn = make_train_step(model, tx, w, mesh)
    x, y = _batch(8)
    state = jax.device_put(state, meshlib.replicated(mesh))
    p0 = np.asarray(state.params["conv1"]["kernel"]).copy()
    new_state, metrics = step_fn(state, x, y)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["iou"]) <= 1.0
    p1 = np.asarray(new_state.params["conv1"]["kernel"])
    assert not np.allclose(p0, p1)

    # a second step must work with the donated buffers
    x2, y2 = _batch(8, key=1)
    new_state2, metrics2 = step_fn(new_state, x2, y2)
    assert int(new_state2.step) == 2


def test_loss_decreases_on_learnable_data(setup):
    """Overfit a fixed batch for a few steps: loss must drop."""
    model, tx, fresh_state, mesh = setup
    state = fresh_state()
    w = [1.0, 1.0, 1.0]
    step_fn = make_train_step(model, tx, w, mesh)
    rng = np.random.RandomState(0)
    y = rng.randint(0, 3, size=(8, 32, 48)).astype(np.int32)
    # data channel 0 carries the label -> easily learnable
    x = rng.randn(8, 32, 48, 16).astype(np.float32) * 0.1
    x[..., 0] = y
    x, y = jnp.asarray(x), jnp.asarray(y)
    state = jax.device_put(state, meshlib.replicated(mesh))
    losses = []
    for _ in range(5):
        state, metrics = step_fn(state, x, y)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_eval_step_count_and_mask(setup):
    model, tx, fresh_state, mesh = setup
    state = fresh_state()
    w = list(class_weights())
    eval_fn = make_eval_step(model, w, mesh)
    state = jax.device_put(state, meshlib.replicated(mesh))
    x, y = _batch(8)
    valid = jnp.asarray(np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32))
    count, loss_sum, iou_sum = eval_fn(state, x, y, valid)
    assert float(count) == 5.0
    assert np.isfinite(float(loss_sum))
    assert 0.0 <= float(iou_sum) <= 5.0


def test_eval_matches_per_sample_reference_semantics(setup):
    """Masked batched eval == sum of independent single-sample evals."""
    model, tx, fresh_state, mesh = setup
    state = fresh_state()
    w = list(class_weights())
    eval_fn = make_eval_step(model, w, mesh)
    state = jax.device_put(state, meshlib.replicated(mesh))
    x, y = _batch(8, key=3)
    valid = jnp.ones((8,), jnp.float32)
    count, loss_sum, iou_sum = eval_fn(state, x, y, valid)

    # single-sample evals (replicate each sample over all 8 devices, count
    # its contribution once)
    from deepcam_tpu.train.losses import weighted_ce_loss
    from deepcam_tpu.train.metrics import compute_score

    total_loss = total_iou = 0.0
    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False,
    )
    for i in range(8):
        total_loss += float(weighted_ce_loss(logits[i], y[i], w))
        preds = jnp.argmax(logits[i], axis=-1)
        total_iou += float(compute_score(preds, y[i], 3))
    np.testing.assert_allclose(float(loss_sum), total_loss, rtol=1e-4)
    np.testing.assert_allclose(float(iou_sum), total_iou, rtol=1e-4)
    assert float(count) == 8.0


@pytest.mark.parametrize("tail", ["0", "1"])
def test_block_loss_matches_fullres(setup, monkeypatch, tail):
    """DEEPCAM_BLOCK_LOSS on vs off (and with the factor-4 block-space
    decoder tail): identical metrics (up to fp summation order) and
    matching gradients — block space only reorders the pixels the loss/IoU
    reduce over.  SGD(1.0) makes the one-step parameter delta literally
    the (pmean'd) gradient, so the comparison is not distorted by Adam's
    rsqrt normalization of near-zero gradients."""
    import optax

    model, _, fresh_state, mesh = setup
    tx = optax.sgd(1.0)
    w = list(class_weights())
    x, y = _batch(8, key=7)

    # pin the concat-form ASPP/decoder merges: the r5 SPLIT_CONCAT
    # default's partial-sum rounding adds ~1e-4 noise on scattered merge-
    # conv grad elements across the two compared programs — orthogonal to
    # what this test pins (split-concat parity: tests/test_model.py)
    monkeypatch.setenv("DEEPCAM_SPLIT_CONCAT", "0")

    def run(flag):
        monkeypatch.setenv("DEEPCAM_BLOCK_LOSS", flag)
        monkeypatch.setenv("DEEPCAM_TAIL_BLOCKS", tail if flag == "1"
                           else "0")
        step_fn = make_train_step(model, tx, w, mesh)
        st = fresh_state()
        st = TrainState(step=st.step, params=st.params,
                        batch_stats=st.batch_stats,
                        opt_state=tx.init(st.params))
        st = jax.device_put(st, meshlib.replicated(mesh))
        new_state, metrics = step_fn(st, x, y)
        return new_state, metrics

    s_b, m_b = run("1")
    s_f, m_f = run("0")
    np.testing.assert_allclose(float(m_b["loss"]), float(m_f["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_b["iou"]), float(m_f["iou"]),
                               rtol=1e-5)
    # atol 2e-5: with one-pass BN statistics (default since r3) the
    # block/full-res grad difference is fp summation noise that grazes 1e-5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5),
        s_b.params, s_f.params,
    )


@pytest.mark.parametrize("tail", ["0", "1"])
def test_block_eval_matches_fullres(setup, monkeypatch, tail):
    """DEEPCAM_BLOCK_EVAL on vs off (and with the factor-4 block-space
    decoder tail): identical count/loss/IoU up to fp summation order —
    per-sample loss means and per-sample IoUs are pixel-order-invariant."""
    model, tx, fresh_state, mesh = setup
    w = list(class_weights())
    x, y = _batch(8, key=11)
    valid = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 0, 0], np.float32))

    def run(flag):
        monkeypatch.setenv("DEEPCAM_BLOCK_EVAL", flag)
        monkeypatch.setenv("DEEPCAM_TAIL_BLOCKS", tail if flag == "1"
                           else "0")
        eval_fn = make_eval_step(model, w, mesh)
        st = jax.device_put(fresh_state(), meshlib.replicated(mesh))
        count, loss_sum, iou_sum = eval_fn(st, x, y, valid)
        return float(count), float(loss_sum), float(iou_sum)

    c_b, l_b, i_b = run("1")
    c_f, l_f, i_f = run("0")
    assert c_b == c_f == 6.0
    np.testing.assert_allclose(l_b, l_f, rtol=1e-5)
    np.testing.assert_allclose(i_b, i_f, rtol=1e-5)


def test_train_step_with_grads_returns_pmeaned_grads(setup):
    """with_grads=True must return the same update plus a grads pytree whose
    structure matches params and whose values are replica-consistent (they
    are pmean'd inside the step) — feeds the wandb.watch gradient histograms
    (reference hooks grads via wandb.watch(net), train_hdf5_ddp.py:326)."""
    model, tx, fresh_state, mesh = setup
    w = list(class_weights())
    x, y = _batch(8, key=5)

    plain = make_train_step(model, tx, w, mesh)
    withg = make_train_step(model, tx, w, mesh, with_grads=True)

    s1 = jax.device_put(fresh_state(), meshlib.replicated(mesh))
    s1, m1 = plain(s1, x, y)
    s2 = jax.device_put(fresh_state(), meshlib.replicated(mesh))
    s2, m2 = withg(s2, x, y)

    grads = m2.pop("grads")
    assert jax.tree_util.tree_structure(grads) == jax.tree_util.tree_structure(
        s2.params
    )
    # identical training result (the variant only ADDS an output)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1.params["conv1"]["kernel"]),
        np.asarray(s2.params["conv1"]["kernel"]), rtol=1e-6, atol=1e-7,
    )
    # grads are real (nonzero somewhere) and finite
    leaf = np.asarray(grads["conv1"]["kernel"])
    assert np.isfinite(leaf).all() and np.abs(leaf).max() > 0
