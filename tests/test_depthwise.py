"""Shift-form depthwise conv vs grouped-conv lowering: exact parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from deepcam_tpu.models import layers
from deepcam_tpu.models.layers import SeparableConv2dSame
from deepcam_tpu.ops.depthwise import depthwise3x3_shifts


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
def test_shifts_match_grouped_conv(stride, dilation):
    rng = np.random.RandomState(0)
    c = 16
    x = jnp.asarray(rng.randn(2, 12, 14, c).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 1, c).astype(np.float32))
    pad = (dilation, dilation)
    want = lax.conv_general_dilated(
        x, k, (stride, stride), (pad, pad), rhs_dilation=(dilation, dilation),
        feature_group_count=c, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = depthwise3x3_shifts(x, k, stride=stride, dilation=dilation, padding=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,dilation", [(1, 1), (1, 2), (2, 1)])
def test_custom_vjp_grads_match_autodiff(stride, dilation):
    """depthwise3x3's hand-built dgrad/wgrad vs XLA autodiff of the plain
    grouped conv — both gradients must agree."""
    from deepcam_tpu.ops.depthwise import depthwise3x3

    rng = np.random.RandomState(2)
    c = 8
    x = jnp.asarray(rng.randn(2, 12, 14, c).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 1, c).astype(np.float32))
    pad = (dilation, dilation) if stride == 1 else (1, 1)

    def ref_fn(x, k):
        y = lax.conv_general_dilated(
            x, k, (stride, stride), (pad, pad),
            rhs_dilation=(dilation, dilation), feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(jnp.sin(y))

    def vjp_fn(x, k):
        return jnp.sum(jnp.sin(depthwise3x3(x, k, stride, dilation, pad)))

    # forward equal
    np.testing.assert_allclose(float(ref_fn(x, k)), float(vjp_fn(x, k)), rtol=1e-5)
    gx_ref, gk_ref = jax.grad(ref_fn, argnums=(0, 1))(x, k)
    gx, gk = jax.grad(vjp_fn, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), rtol=1e-4, atol=1e-4)


def test_custom_vjp_odd_sizes():
    """Odd spatial sizes for the stride-2 dgrad padding arithmetic."""
    from deepcam_tpu.ops.depthwise import depthwise3x3

    rng = np.random.RandomState(3)
    c = 4
    x = jnp.asarray(rng.randn(1, 11, 13, c).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 1, c).astype(np.float32))

    def ref_fn(x, k):
        y = lax.conv_general_dilated(
            x, k, (2, 2), ((1, 1), (1, 1)), feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y ** 2)

    def vjp_fn(x, k):
        return jnp.sum(depthwise3x3(x, k, 2, 1, (1, 1)) ** 2)

    gx_ref, gk_ref = jax.grad(ref_fn, argnums=(0, 1))(x, k)
    gx, gk = jax.grad(vjp_fn, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), rtol=1e-4, atol=1e-4)


def test_separable_conv_same_impl_switch_is_equivalent():
    """Same params, same outputs under either depthwise lowering."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 10, 12, 8).astype(np.float32))
    mod = SeparableConv2dSame(features=16, stride=2)
    params = mod.init(jax.random.PRNGKey(0), x)
    try:
        layers.set_depthwise_impl("conv")
        y_conv = np.asarray(mod.apply(params, x))
        layers.set_depthwise_impl("shifts")
        y_shift = np.asarray(mod.apply(params, x))
    finally:
        layers.set_depthwise_impl("conv")
    np.testing.assert_allclose(y_conv, y_shift, rtol=1e-5, atol=1e-5)
