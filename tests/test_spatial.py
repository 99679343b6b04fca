"""Parity tests for the fused-kernel spatial-partitioning path
(parallel/spatial.py): zero-pad-local ops + additive halo-strip
corrections under shard_map over ('data', 'spatial').

Strategy: component- and region-level checks are EXACT (1e-5-ish — the
strips reproduce the unsharded math up to summation order); the full
model at random init is chaos-limited (a 1e-6 input perturbation moves
the REFERENCE's own gradients by ~7% through 16 residual blocks + BN
stat coupling — measured r5), so full-model checks assert the loss value
(exact) and a relative forward tolerance, plus step/eval equivalence
against the data-parallel trainer where the semantics coincide.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax import lax
from jax.sharding import PartitionSpec as P

from deepcam_tpu.core import mesh as meshlib
from deepcam_tpu.parallel import spatial as sp

pytestmark = pytest.mark.slow


def _mesh2():
    return meshlib.make_mesh(spatial=2, devices=jax.devices()[:2])


def _grad_parity(mod, x, ct, apply_fn, atol_rel=1e-4):
    """Compare loss + param/x grads: single-device vs 2-shard spatial."""
    mesh = _mesh2()
    v = jax.jit(lambda r: mod.init(r, x[:1]) if apply_fn is None
                else apply_fn(mod.init, r, x))(jax.random.PRNGKey(3))

    def lref(vv, xx):
        return jnp.sum(apply_fn(mod.apply, vv, xx) * ct)

    lr, (gvr, gxr) = jax.value_and_grad(lref, argnums=(0, 1))(v, x)

    def body(vv, xs, cts):
        with sp.spatial_mode("spatial", 2):
            def lf(vv2, xx2):
                return jnp.sum(apply_fn(mod.apply, vv2, xx2) * cts)

            l, (gv, gx) = jax.value_and_grad(lf, argnums=(0, 1))(vv, xs)
        return (lax.psum(l, "spatial"),
                lax.psum(gv, ("data", "spatial")), gx)

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data", "spatial"), P("data", "spatial")),
        out_specs=(P(), P(), P("data", "spatial")), check_vma=False)
    ls, gvs, gxs = jax.jit(f)(v, x, ct)

    assert abs(float(ls - lr)) < 1e-3 * (abs(float(lr)) + 1.0)
    for (ka, a), (_, b) in zip(jtu.tree_flatten_with_path(gvs)[0],
                               jtu.tree_flatten_with_path(gvr)[0]):
        scale = float(jnp.max(jnp.abs(b))) + 1e-8
        rel = float(jnp.max(jnp.abs(a - b))) / scale
        assert rel < atol_rel, (jtu.keystr(ka), rel)
    xrel = (float(jnp.max(jnp.abs(gxs - gxr)))
            / (float(jnp.max(jnp.abs(gxr))) + 1e-8))
    assert xrel < atol_rel, xrel


@pytest.mark.parametrize("cfg", ["s1_relu", "d2", "s2", "affine"])
def test_sepconv_spatial_grad_parity(cfg):
    from deepcam_tpu.models.layers import SeparableConv2dSame

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 8, 12, 32), jnp.float32)
    if cfg == "s1_relu":
        mod = SeparableConv2dSame(features=32, kernel_size=3,
                                  pre_relu=True, dtype=jnp.float32)
        ct = jnp.asarray(rng.randn(2, 8, 12, 32), jnp.float32)
    elif cfg == "d2":
        mod = SeparableConv2dSame(features=32, kernel_size=3, dilation=2,
                                  pre_relu=True, dtype=jnp.float32)
        ct = jnp.asarray(rng.randn(2, 8, 12, 32), jnp.float32)
    elif cfg == "s2":
        mod = SeparableConv2dSame(features=32, kernel_size=3, stride=2,
                                  dtype=jnp.float32)
        ct = jnp.asarray(rng.randn(2, 4, 6, 32), jnp.float32)
    else:  # affine (bn_fold)
        a = jnp.asarray(0.5 + rng.rand(32), jnp.float32)
        b = jnp.asarray(rng.randn(32), jnp.float32)
        mod = SeparableConv2dSame(features=32, kernel_size=3,
                                  pre_relu=True, dtype=jnp.float32)
        ct = jnp.asarray(rng.randn(2, 8, 12, 32), jnp.float32)
        _grad_parity(mod, x, ct,
                     lambda fn, vv, xx: fn(vv, xx, bn_fold=(a, b)))
        return
    _grad_parity(mod, x, ct, lambda fn, vv, xx: fn(vv, xx))


@pytest.mark.parametrize("cfg", ["plain", "smallch", "smallch_s2",
                                 "deconv"])
def test_conv_spatial_grad_parity(cfg):
    from deepcam_tpu.models.layers import Conv2d, ConvTranspose2d

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 8, 12, 32), jnp.float32)
    if cfg == "plain":
        mod = Conv2d(32, 3, padding=1, dtype=jnp.float32)
        ct = jnp.asarray(rng.randn(2, 8, 12, 32), jnp.float32)
    elif cfg == "smallch":
        mod = Conv2d(32, 3, padding=1, small_ch_vjp=True,
                     dtype=jnp.float32)
        ct = jnp.asarray(rng.randn(2, 8, 12, 32), jnp.float32)
    elif cfg == "smallch_s2":
        mod = Conv2d(32, 3, stride=2, padding=1, small_ch_vjp=True,
                     dtype=jnp.float32)
        ct = jnp.asarray(rng.randn(2, 4, 6, 32), jnp.float32)
    else:
        mod = ConvTranspose2d(16, dtype=jnp.float32)
        ct = jnp.asarray(rng.randn(2, 16, 24, 16), jnp.float32)
    _grad_parity(mod, x, ct, lambda fn, vv, xx: fn(vv, xx))


def test_bn_sync_spatial_grad_parity():
    from deepcam_tpu.models.layers import BatchNorm2d

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 8, 12, 32), jnp.float32)
    ct = jnp.asarray(rng.randn(2, 8, 12, 32), jnp.float32)
    bn = BatchNorm2d(dtype=jnp.float32)

    def apply_fn(fn, vv, xx):
        out = fn(vv, xx, True, mutable=["batch_stats"])
        if isinstance(out, tuple):
            return out[0]
        return out

    # init path needs the train flag too
    mesh = _mesh2()
    v = jax.jit(lambda r: bn.init(r, x[:1], True))(jax.random.PRNGKey(3))

    def lref(vv, xx):
        y, _ = bn.apply(vv, xx, True, mutable=["batch_stats"])
        return jnp.sum(y * ct)

    lr, (gvr, gxr) = jax.value_and_grad(lref, argnums=(0, 1))(v, x)

    def body(vv, xs, cts):
        with sp.spatial_mode("spatial", 2):
            def lf(vv2, xx2):
                y, _ = bn.apply(vv2, xx2, True, mutable=["batch_stats"])
                return jnp.sum(y * cts)

            l, (gv, gx) = jax.value_and_grad(lf, argnums=(0, 1))(vv, xs)
        return (lax.psum(l, "spatial"),
                lax.psum(gv, ("data", "spatial")), gx)

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data", "spatial"), P("data", "spatial")),
        out_specs=(P(), P(), P("data", "spatial")), check_vma=False)
    ls, gvs, gxs = jax.jit(f)(v, x, ct)
    assert abs(float(ls - lr)) < 1e-3
    for (ka, a), (_, b) in zip(jtu.tree_flatten_with_path(gvs)[0],
                               jtu.tree_flatten_with_path(gvr)[0]):
        rel = (float(jnp.max(jnp.abs(a - b)))
               / (float(jnp.max(jnp.abs(b))) + 1e-8))
        assert rel < 1e-4, (jtu.keystr(ka), rel)


@pytest.mark.parametrize("cfg", ["block_s2", "middle", "dil2_tiny"])
def test_xception_block_spatial_fwd_parity(cfg):
    from deepcam_tpu.models.xception import XceptionBlock

    rng = np.random.RandomState(1)
    if cfg == "block_s2":
        blk = XceptionBlock(64, reps=2, stride=2, dtype=jnp.float32)
        x = jnp.asarray(rng.rand(2, 16, 12, 32), jnp.float32)
    elif cfg == "middle":
        blk = XceptionBlock(32, reps=3, stride=1, dtype=jnp.float32)
        x = jnp.asarray(rng.rand(2, 8, 12, 32), jnp.float32)
    else:  # dilation-2 at Hs == d (the exit-flow extreme)
        blk = XceptionBlock(32, reps=3, stride=1, dilation=2,
                            dtype=jnp.float32)
        x = jnp.asarray(rng.rand(2, 4, 12, 32), jnp.float32)
    mesh = _mesh2()
    v = jax.jit(lambda r: blk.init(r, x[:1], False))(jax.random.PRNGKey(3))
    ref = blk.apply(v, x, False)

    def body(vv, xs):
        with sp.spatial_mode("spatial", 2):
            return blk.apply(vv, xs, False)

    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(P(), P("data", "spatial")),
                      out_specs=P("data", "spatial"), check_vma=False)
    got = jax.jit(f)(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_full_model_spatial_parity():
    """Full DeepLabv3+ train-mode forward on 2 H-shards vs single device:
    loss-relevant logits track to a relative tolerance (interior rows are
    reassociation-exact; edge rows within strip rounding) and BN stats
    match."""
    from deepcam_tpu.models.deeplab import DeepLabv3plus

    model = DeepLabv3plus(n_classes=3, output_stride=16,
                          dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 48, 16), jnp.float32)
    variables = jax.jit(
        lambda r: model.init(r, x[:1], train=False)
    )(jax.random.PRNGKey(5))
    ref, upd = model.apply(variables, x, train=True,
                           mutable=["batch_stats"], block_logits=False)
    mesh = _mesh2()

    def body(params, bs, xs):
        with sp.spatial_mode("spatial", 2):
            y, u = model.apply(
                {"params": params, "batch_stats": bs}, xs, train=True,
                mutable=["batch_stats"], block_logits=False)
        return y, u["batch_stats"]

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P("data", "spatial")),
        out_specs=(P("data", "spatial"), P()), check_vma=False)
    got, bs2 = jax.jit(f)(variables["params"], variables["batch_stats"], x)
    scale = float(jnp.max(jnp.abs(ref)))
    rel = float(jnp.max(jnp.abs(got - ref))) / scale
    assert rel < 2e-3, rel  # chaos-amplified reassociation band (see module doc)
    for (ka, a), (_, b) in zip(jtu.tree_flatten_with_path(bs2)[0],
                               jtu.tree_flatten_with_path(
                                   upd["batch_stats"])[0]):
        r = (float(jnp.max(jnp.abs(a - b)))
             / (float(jnp.max(jnp.abs(b))) + 1e-6))
        assert r < 2e-3, (jtu.keystr(ka), r)


def test_spatial_train_step_matches_dp_loss():
    """Step-0 loss of the spatial trainer (data=2 x spatial=2, per-replica
    batch 1) equals the DP trainer's on the same 2-sample global batch
    with 2 replicas — identical math (each spatial group's sync-BN over
    one sample == DP's per-device BN over that sample), different
    sharding."""
    from deepcam_tpu.models.deeplab import DeepLabv3plus
    from deepcam_tpu.train.losses import class_weights
    from deepcam_tpu.train.optim import build_optimizer
    from deepcam_tpu.train.trainer import create_train_state, make_train_step

    model = DeepLabv3plus(n_classes=3, output_stride=16,
                          dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 48, 16), jnp.float32)
    y = jnp.asarray(rng.randint(0, 3, (2, 64, 48)), jnp.int32)
    variables = jax.jit(
        lambda r: model.init(r, x[:1], train=False)
    )(jax.random.PRNGKey(5))
    w = list(class_weights())
    tx = build_optimizer("AdamW", 1e-3, eps=1e-8, weight_decay=1e-2)

    # independent state copies: the DP step DONATES its state, which
    # would delete buffers shared with `variables`
    sp_mesh = meshlib.make_mesh(
        spatial=2, devices=jax.devices()[:4])  # (data=2, spatial=2)
    state2 = create_train_state(
        model, jtu.tree_map(jnp.array, variables), tx)

    dp_mesh = meshlib.make_mesh(devices=jax.devices()[:2])
    state = create_train_state(model, variables, tx)
    state = jax.device_put(state, meshlib.replicated(dp_mesh))
    dp_step = make_train_step(model, tx, w, dp_mesh)
    _, m_dp = dp_step(state, x, y)
    state2 = jax.device_put(state2, meshlib.replicated(sp_mesh))
    sp_step = sp.make_train_step_spatial(model, tx, w, sp_mesh)
    xs = jax.device_put(x, meshlib.batch_sharding(sp_mesh))
    ys = jax.device_put(y, meshlib.batch_sharding(sp_mesh))
    new_state, m_sp = sp_step(state2, xs, ys)

    assert abs(float(m_dp["loss"]) - float(m_sp["loss"])) < 1e-3
    assert abs(float(m_dp["iou"]) - float(m_sp["iou"])) < 1e-3
    assert int(new_state.step) == 1


def test_spatial_eval_step_matches_dp():
    """Spatial eval (count, loss_sum, iou_sum) equals the DP eval on the
    same batch + validity mask (per-sample semantics preserved across
    H-shards)."""
    from deepcam_tpu.models.deeplab import DeepLabv3plus
    from deepcam_tpu.train.losses import class_weights
    from deepcam_tpu.train.optim import build_optimizer
    from deepcam_tpu.train.trainer import (
        create_train_state,
        make_eval_step,
    )

    model = DeepLabv3plus(n_classes=3, output_stride=16,
                          dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 48, 16), jnp.float32)
    y = jnp.asarray(rng.randint(0, 3, (2, 64, 48)), jnp.int32)
    valid = jnp.asarray([1.0, 0.0], jnp.float32)  # one padded sample
    variables = jax.jit(
        lambda r: model.init(r, x[:1], train=False)
    )(jax.random.PRNGKey(5))
    w = list(class_weights())
    tx = build_optimizer("AdamW", 1e-3, eps=1e-8, weight_decay=1e-2)

    dp_mesh = meshlib.make_mesh(devices=jax.devices()[:2])
    state = create_train_state(model, variables, tx)
    state = jax.device_put(state, meshlib.replicated(dp_mesh))
    c1, l1, i1 = make_eval_step(model, w, dp_mesh)(state, x, y, valid)

    sp_mesh = meshlib.make_mesh(spatial=2, devices=jax.devices()[:4])
    state2 = create_train_state(model, variables, tx)
    state2 = jax.device_put(state2, meshlib.replicated(sp_mesh))
    ev = sp.make_eval_step_spatial(model, w, sp_mesh)
    xs = jax.device_put(x, meshlib.batch_sharding(sp_mesh))
    ys = jax.device_put(y, meshlib.batch_sharding(sp_mesh))
    from jax.sharding import NamedSharding

    vs = jax.device_put(valid, NamedSharding(sp_mesh, P("data")))
    c2, l2, i2 = ev(state2, xs, ys, vs)

    assert float(c1) == float(c2) == 1.0
    assert abs(float(l1) - float(l2)) < 1e-3 * (abs(float(l1)) + 1.0)
    assert abs(float(i1) - float(i2)) < 1e-3
