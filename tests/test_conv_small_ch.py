"""conv3x3_small_ch custom VJP vs XLA autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from deepcam_tpu.ops.conv_small_ch import conv3x3_small_ch


@pytest.mark.parametrize("stride,hw", [(1, (12, 14)), (2, (12, 14)), (2, (11, 13))])
def test_grads_match_autodiff(stride, hw):
    rng = np.random.RandomState(0)
    h, w = hw
    ci, co = 5, 7
    x = jnp.asarray(rng.randn(2, h, w, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32))

    def ref_fn(x, k):
        y = lax.conv_general_dilated(
            x, k, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(jnp.sin(y))

    def vjp_fn(x, k):
        return jnp.sum(jnp.sin(conv3x3_small_ch(x, k, stride)))

    np.testing.assert_allclose(float(ref_fn(x, k)), float(vjp_fn(x, k)), rtol=1e-5)
    gx_ref, gk_ref = jax.grad(ref_fn, argnums=(0, 1))(x, k)
    gx, gk = jax.grad(vjp_fn, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hw,ci,co", [((12, 14), 5, 7), ((16, 24), 16, 32)])
def test_s2d_matches_strided(hw, ci, co):
    """conv3x3s2_s2d (space-to-depth form) == the strided conv, forward and
    both gradients — including dx through the inverse-s2d dgrad path."""
    from deepcam_tpu.ops.conv_small_ch import conv3x3s2_s2d

    rng = np.random.RandomState(3)
    h, w = hw
    x = jnp.asarray(rng.randn(2, h, w, ci).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32))

    def ref_fn(x, k):
        y = lax.conv_general_dilated(
            x, k, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(jnp.sin(y))

    def s2d_fn(x, k):
        return jnp.sum(jnp.sin(conv3x3s2_s2d(x, k)))

    np.testing.assert_allclose(float(ref_fn(x, k)), float(s2d_fn(x, k)),
                               rtol=1e-5)
    gx_ref, gk_ref = jax.grad(ref_fn, argnums=(0, 1))(x, k)
    gx, gk = jax.grad(s2d_fn, argnums=(0, 1))(x, k)
    # atol 1e-4: the 64-lane contraction reassociates the fp32 sums
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               rtol=1e-4, atol=1e-4)


def test_conv2d_s2d_route(monkeypatch):
    """Conv2d(small_ch_vjp=True, stride=2) routes through the s2d form when
    DEEPCAM_S2D=1 and stays numerically identical."""
    from deepcam_tpu.models.layers import Conv2d

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 16, 24, 4).astype(np.float32))
    m = Conv2d(8, 3, stride=2, padding=1, small_ch_vjp=True)
    params = m.init(jax.random.PRNGKey(0), x)
    base = np.asarray(m.apply(params, x))
    gk_base = np.asarray(jax.grad(
        lambda p: jnp.sum(m.apply(p, x) ** 2))(params)["params"]["kernel"])
    monkeypatch.setenv("DEEPCAM_S2D", "1")
    np.testing.assert_allclose(np.asarray(m.apply(params, x)), base,
                               rtol=1e-5, atol=1e-5)
    gk = np.asarray(jax.grad(
        lambda p: jnp.sum(m.apply(p, x) ** 2))(params)["params"]["kernel"])
    np.testing.assert_allclose(gk, gk_base, rtol=1e-4, atol=1e-4)


def test_conv2d_small_ch_flag_trains():
    """Conv2d(small_ch_vjp=True) produces identical fwd and trainable grads."""
    from deepcam_tpu.models.layers import Conv2d

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 24, 4).astype(np.float32))
    m_ref = Conv2d(8, 3, stride=2, padding=1)
    m_new = Conv2d(8, 3, stride=2, padding=1, small_ch_vjp=True)
    params = m_ref.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(m_ref.apply(params, x)),
        np.asarray(m_new.apply(params, x)),
        rtol=1e-5, atol=1e-5,
    )
    g_ref = jax.grad(lambda p: jnp.sum(m_ref.apply(p, x) ** 2))(params)
    g_new = jax.grad(lambda p: jnp.sum(m_new.apply(p, x) ** 2))(params)
    np.testing.assert_allclose(
        np.asarray(g_ref["params"]["kernel"]),
        np.asarray(g_new["params"]["kernel"]),
        rtol=1e-4, atol=1e-4,
    )


def test_conv1x1s2_matches_xla():
    """Skip-projection 1x1/s2 custom VJP (phase-form backward) vs autodiff."""
    from deepcam_tpu.ops.conv_small_ch import conv1x1s2

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 5, 7).astype(np.float32))

    def ref(x, k):
        from jax import lax
        return lax.conv_general_dilated(
            x, k, (2, 2), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y_ref, vjp_ref = jax.vjp(ref, x, k)
    y, vjp = jax.vjp(conv1x1s2, x, k)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    dy = jnp.asarray(rng.randn(*y.shape).astype(np.float32))
    (dx_r, dk_r), (dx, dk) = vjp_ref(dy), vjp(dy)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                               rtol=1e-5, atol=1e-4)


def test_conv2d_skip_routing_matches(monkeypatch):
    """Conv2d(1x1, stride 2) grads identical with the skip VJP on/off."""
    from deepcam_tpu.models.layers import Conv2d

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 12, 6).astype(np.float32))

    def run():
        m = Conv2d(4, 1, stride=2, padding=0)
        p = m.init(jax.random.PRNGKey(0), x)
        g = jax.grad(lambda p, x: jnp.sum(m.apply(p, x) ** 2),
                     argnums=(0, 1))(p, x)
        return m.apply(p, x), g

    monkeypatch.setenv("DEEPCAM_SKIP_VJP", "0")
    y_off, (gp_off, gx_off) = run()
    monkeypatch.setenv("DEEPCAM_SKIP_VJP", "1")
    y_on, (gp_on, gx_on) = run()
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx_on), np.asarray(gx_off),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gp_on["params"]["kernel"]),
        np.asarray(gp_off["params"]["kernel"]), rtol=1e-5, atol=1e-4)


def test_s2d_input_model_parity(monkeypatch):
    """DEEPCAM-style pre-s2d input feed: the model on s2d_host(x) with
    s2d_input=True is BIT-EXACT vs the (forced-)s2d baseline on x —
    eval logits, block-space train loss, and every gradient."""
    monkeypatch.setenv("DEEPCAM_S2D", "1")
    from deepcam_tpu.models.deeplab import DeepLabv3plus
    from deepcam_tpu.ops.conv_small_ch import s2d_host
    from deepcam_tpu.train.losses import class_weights, weighted_ce_loss
    from deepcam_tpu.train.trainer import _block_labels

    model = DeepLabv3plus(n_classes=3, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 96, 16).astype(np.float32)
    v = model.init(jax.random.PRNGKey(5), jnp.asarray(x), train=False)
    y0 = model.apply(v, jnp.asarray(x), train=False)
    xs = jnp.asarray(s2d_host(x))
    y1 = model.apply(v, xs, train=False, s2d_input=True)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    W = list(class_weights())
    yl = jnp.asarray(rng.randint(0, 3, size=(1, 64, 96)))

    def loss(p, xx, s2d):
        logits, _ = model.apply(
            {"params": p, "batch_stats": v["batch_stats"]}, xx,
            train=True, mutable=["batch_stats"], block_logits=True,
            s2d_input=s2d)
        return weighted_ce_loss(logits, _block_labels(logits, yl), W)

    l0, g0 = jax.value_and_grad(loss)(v["params"], jnp.asarray(x), False)
    l1, g1 = jax.value_and_grad(loss)(v["params"], xs, True)
    np.testing.assert_array_equal(float(l0), float(l1))
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_array_equal(np.asarray(p),
                                                   np.asarray(q)), g1, g0)
