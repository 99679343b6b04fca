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
