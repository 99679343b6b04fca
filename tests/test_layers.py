"""Golden tests: our NHWC/HWIO layers vs torch functional ops (CPU).

These tests do not use any reference code — they check our primitives against
the *framework* semantics (torch.nn.functional) the reference relies on, with
identical weights loaded both ways.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from deepcam_tpu.models.layers import (
    BatchNorm2d,
    Conv2d,
    ConvTranspose2d,
    SeparableConv2dSame,
    fixed_padding,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def _to_oihw(k_hwio):
    # HWIO -> OIHW
    return torch.from_numpy(np.transpose(k_hwio, (3, 2, 0, 1)).copy())


@pytest.mark.parametrize(
    "in_ch,out_ch,k,stride,pad,dil,groups",
    [
        (16, 32, 3, 2, 1, 1, 1),   # entry conv1
        (8, 8, 3, 1, 1, 1, 8),     # depthwise
        (8, 24, 1, 1, 0, 1, 1),    # pointwise
        (12, 6, 3, 1, 2, 2, 1),    # dilated
    ],
)
def test_conv2d_matches_torch(in_ch, out_ch, k, stride, pad, dil, groups):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 12, 16, in_ch).astype(np.float32)
    mod = Conv2d(
        features=out_ch, kernel_size=k, stride=stride, padding=pad,
        dilation=dil, groups=groups,
    )
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kernel = np.asarray(params["params"]["kernel"])

    y = np.asarray(mod.apply(params, jnp.asarray(x)))
    y_t = F.conv2d(
        _nchw(x), _to_oihw(kernel), stride=stride, padding=pad,
        dilation=dil, groups=groups,
    ).numpy()
    np.testing.assert_allclose(y, np.transpose(y_t, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("in_ch,out_ch", [(8, 8), (8, 3)])
def test_conv_transpose_matches_torch(in_ch, out_ch):
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 9, in_ch).astype(np.float32)
    mod = ConvTranspose2d(features=out_ch)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kernel = np.asarray(params["params"]["kernel"])  # HWIO (kh,kw,in,out)

    y = np.asarray(mod.apply(params, jnp.asarray(x)))
    # torch ConvTranspose2d weight layout: (in, out, kh, kw)
    w_t = torch.from_numpy(np.transpose(kernel, (2, 3, 0, 1)).copy())
    y_t = F.conv_transpose2d(
        _nchw(x), w_t, stride=2, padding=1, output_padding=1
    ).numpy()
    assert y.shape == (2, 12, 18, out_ch)
    np.testing.assert_allclose(y, np.transpose(y_t, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("method", ["polyphase", "d2s"])
@pytest.mark.parametrize("in_ch,out_ch", [(8, 8), (8, 3)])
def test_conv_transpose_alt_methods_match(method, in_ch, out_ch):
    """polyphase / d2s schedules == the dilated form, fwd and grads."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 6, 9, in_ch).astype(np.float32))
    ref = ConvTranspose2d(features=out_ch, method="dilated")
    alt = ConvTranspose2d(features=out_ch, method=method)
    params = ref.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(ref.apply(params, x)), np.asarray(alt.apply(params, x)),
        rtol=1e-4, atol=1e-5,
    )
    g_ref = jax.grad(lambda p, x: jnp.sum(jnp.sin(ref.apply(p, x))),
                     argnums=(0, 1))(params, x)
    g_alt = jax.grad(lambda p, x: jnp.sum(jnp.sin(alt.apply(p, x))),
                     argnums=(0, 1))(params, x)
    np.testing.assert_allclose(
        np.asarray(g_ref[0]["params"]["kernel"]),
        np.asarray(g_alt[0]["params"]["kernel"]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g_ref[1]), np.asarray(g_alt[1]), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,dil", [(1, 1), (2, 1), (1, 2)])
def test_separable_conv_same_matches_torch(stride, dil):
    """fixed_padding + depthwise + pointwise vs torch F.pad + conv2d
    (reference SeparableConv2d_same semantics, deeplab_xception.py:54-66)."""
    in_ch, out_ch = 8, 16
    rng = np.random.RandomState(2)
    x = rng.randn(2, 10, 14, in_ch).astype(np.float32)
    mod = SeparableConv2dSame(features=out_ch, stride=stride, dilation=dil)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kd = np.asarray(params["params"]["depthwise"]["kernel"])
    kp = np.asarray(params["params"]["pointwise"]["kernel"])

    y = np.asarray(mod.apply(params, jnp.asarray(x)))

    beg, end = fixed_padding(3, dil)
    xt = F.pad(_nchw(x), (beg, end, beg, end))
    yt = F.conv2d(xt, _to_oihw(kd), stride=stride, dilation=dil, groups=in_ch)
    yt = F.conv2d(yt, _to_oihw(kp)).numpy()
    np.testing.assert_allclose(y, np.transpose(yt, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4)


def test_batchnorm_train_and_eval_match_torch():
    rng = np.random.RandomState(3)
    c = 8
    x1 = rng.randn(4, 5, 7, c).astype(np.float32) * 2 + 1
    x2 = rng.randn(4, 5, 7, c).astype(np.float32)

    mod = BatchNorm2d()
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x1), train=False)
    # randomize scale/bias
    scale = rng.randn(c).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": variables["batch_stats"],
    }

    bn_t = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        bn_t.weight.copy_(torch.from_numpy(scale))
        bn_t.bias.copy_(torch.from_numpy(bias))

    # two training steps: outputs and running stats must track torch
    state = variables
    for x in (x1, x2):
        y, updates = mod.apply(state, jnp.asarray(x), train=True, mutable=["batch_stats"])
        state = {"params": state["params"], "batch_stats": updates["batch_stats"]}
        bn_t.train()
        y_t = bn_t(_nchw(x)).detach().numpy()
        np.testing.assert_allclose(
            np.asarray(y), np.transpose(y_t, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4
        )

    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["mean"]),
        bn_t.running_mean.numpy(), rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["var"]),
        bn_t.running_var.numpy(), rtol=1e-5, atol=1e-5,
    )

    # eval mode uses running stats
    bn_t.eval()
    y_eval = np.asarray(mod.apply(state, jnp.asarray(x1), train=False))
    y_eval_t = bn_t(_nchw(x1)).detach().numpy()
    np.testing.assert_allclose(
        y_eval, np.transpose(y_eval_t, (0, 2, 3, 1)), rtol=1e-4, atol=1e-4
    )


def test_resize_align_corners_matches_torch():
    from deepcam_tpu.ops.interpolate import resize_bilinear_align_corners

    rng = np.random.RandomState(4)
    x = rng.randn(2, 6, 9, 5).astype(np.float32)
    for size in [(12, 18), (24, 36), (5, 7), (6, 9)]:
        y = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), size))
        y_t = F.interpolate(_nchw(x), size=size, mode="bilinear", align_corners=True)
        np.testing.assert_allclose(
            y, np.transpose(y_t.numpy(), (0, 2, 3, 1)), rtol=1e-4, atol=1e-4
        )
    # 1x1 broadcast path (ASPP global-pool branch)
    x1 = rng.randn(2, 1, 1, 5).astype(np.float32)
    y = np.asarray(resize_bilinear_align_corners(jnp.asarray(x1), (4, 6)))
    y_t = F.interpolate(_nchw(x1), size=(4, 6), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(y, np.transpose(y_t.numpy(), (0, 2, 3, 1)), rtol=1e-5, atol=1e-5)


def test_batchnorm_group_blocks():
    """group_blocks=G: identical statistics/apply to running the BN on the
    un-blocked (..., C) layout — G block copies fold into one channel set."""
    import numpy as np

    from deepcam_tpu.models.layers import BatchNorm2d

    rng = np.random.RandomState(41)
    g, c = 4, 16
    xg = jnp.asarray(rng.randn(2, 6, 5, g * c), jnp.float32)  # (a,b,C) lanes
    # un-blocked equivalent: stack the G groups along a spatial dim
    xf = jnp.concatenate(
        [xg[..., i * c:(i + 1) * c] for i in range(g)], axis=2)

    bn = BatchNorm2d(dtype=jnp.float32)
    v = bn.init(jax.random.PRNGKey(0), xf, train=True)

    yg, upd_g = bn.apply(v, xg, train=True, group_blocks=g,
                         mutable=["batch_stats"])
    yf, upd_f = bn.apply(v, xf, train=True, mutable=["batch_stats"])

    # same normalized values (up to the one-pass vs two-pass var fp noise)
    yf_blocks = jnp.concatenate(
        [yf[:, :, i * 5:(i + 1) * 5, :] for i in range(g)], axis=-1)
    np.testing.assert_allclose(np.asarray(yg), np.asarray(yf_blocks),
                               rtol=1e-4, atol=1e-5)
    # same running-stat updates
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        upd_g["batch_stats"], upd_f["batch_stats"],
    )


def test_batchnorm_one_pass_matches_two_pass(monkeypatch):
    """DEEPCAM_BN_ONEPASS: identical mean/var/updates to the centered
    two-pass form within fp32 cancellation tolerance."""
    import numpy as np

    from deepcam_tpu.models.layers import BatchNorm2d

    rng = np.random.RandomState(42)
    x = jnp.asarray(3.0 + rng.randn(2, 8, 6, 16), jnp.float32)  # mean >> 0
    bn = BatchNorm2d(dtype=jnp.float32)
    v = bn.init(jax.random.PRNGKey(0), x, train=True)

    def run(flag):
        monkeypatch.setenv("DEEPCAM_BN_ONEPASS", flag)
        y, upd = bn.apply(v, x, train=True, mutable=["batch_stats"])
        g = jax.grad(lambda x: jnp.sum(
            bn.apply(v, x, train=True, mutable=["batch_stats"])[0] ** 2))(x)
        return y, upd["batch_stats"], g

    y1, u1, g1 = run("1")
    y0, u0, g0 = run("0")
    # E[x²]−mean² loses ~(mean²/var)·eps_f32 of var to cancellation — at
    # this test's mean≈3, var≈1 that is ~1e-6 relative on var, ~3e-5
    # absolute on the normalized output (the same numerics class as
    # cuDNN's one-pass BN)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-3, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4),
        (u1, g1), (u0, g0),
    )


@pytest.mark.parametrize("relu", [False, True])
@pytest.mark.parametrize("stats_path", ["two_pass", "one_pass"])
def test_bn_custom_backward_matches_autodiff(relu, stats_path, monkeypatch):
    """DEEPCAM_BN_BWD=1: the closed-form BN backward (full-tensor
    cotangents in compute dtype, per-channel reductions fp32) must match
    XLA autodiff through the batch-statistics chain — dx, dgamma, dbeta —
    under both stats forms."""
    monkeypatch.setenv("DEEPCAM_BN_ONEPASS",
                       "1" if stats_path == "one_pass" else "0")
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 8, 12, 16) * 2 + 0.3, jnp.float32)
    gy = jnp.asarray(rng.randn(2, 8, 12, 16), jnp.float32)
    mod = BatchNorm2d(dtype=jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x, True)

    def run(custom):
        monkeypatch.setenv("DEEPCAM_BN_BWD", "1" if custom else "0")

        def loss(p, x):
            y, _ = mod.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, True, relu=relu, mutable=["batch_stats"])
            return jnp.sum(y * gy)

        l, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(
            v["params"], x)
        return float(l), gp, gx

    l0, gp0, gx0 = run(False)
    l1, gp1, gx1 = run(True)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(gp0[k]), np.asarray(gp1[k]),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1),
                               rtol=1e-4, atol=1e-5)


def test_bn_custom_backward_bf16_cotangent_dtype(monkeypatch):
    """In bf16 compute the custom backward's full-tensor cotangent stays
    bf16 (the point of the form: autodiff promotes it to fp32 through the
    fp32 stats reductions) and tracks the fp32 reference."""
    monkeypatch.setenv("DEEPCAM_BN_BWD", "1")
    rng = np.random.RandomState(8)
    x16 = jnp.asarray(rng.randn(2, 8, 12, 16), jnp.bfloat16)
    gy = jnp.asarray(rng.randn(2, 8, 12, 16), jnp.bfloat16)
    mod = BatchNorm2d(dtype=jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x16, True)

    def loss(x):
        y, _ = mod.apply(v, x, True, relu=True, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) * gy.astype(jnp.float32))

    gx = jax.grad(loss)(x16)
    assert gx.dtype == jnp.bfloat16
    # fp32 autodiff reference on the same values
    monkeypatch.setenv("DEEPCAM_BN_BWD", "0")
    mod32 = BatchNorm2d(dtype=jnp.float32)
    x32 = x16.astype(jnp.float32)
    v32 = mod32.init(jax.random.PRNGKey(0), x32, True)

    def loss32(x):
        y, _ = mod32.apply(v32, x, True, relu=True, mutable=["batch_stats"])
        return jnp.sum(y * gy.astype(jnp.float32))

    gx32 = jax.grad(loss32)(x32)
    denom = float(jnp.linalg.norm(gx32)) + 1e-30
    rel = float(jnp.linalg.norm(gx.astype(jnp.float32) - gx32)) / denom
    assert rel < 0.02, rel
