"""Parity of the shift-decomposed atrous conv (ops/atrous.py) with XLA's
rhs_dilation schedule — the ASPP branch convs (reference
``deeplab_xception.py:282-312``, rates 6/12/18)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from deepcam_tpu.ops.atrous import conv3x3_atrous


def _ref(x, k, rate):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((rate, rate), (rate, rate)),
        rhs_dilation=(rate, rate),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("rate", [2, 6, 12, 18])
def test_fwd_and_grads_match_xla(rate):
    n, h, w, c, f = 2, 12, 18, 16, 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, c, f).astype(np.float32))
    dy = jnp.asarray(rng.randn(n, h, w, f).astype(np.float32))

    y_ref, vjp_ref = jax.vjp(lambda x, k: _ref(x, k, rate), x, k)
    y, vjp = jax.vjp(lambda x, k: conv3x3_atrous(x, k, rate), x, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-4)
    dx_ref, dk_ref = vjp_ref(dy)
    dx, dk = vjp(dy)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-5, atol=1e-3)


def test_rate_exceeding_extent():
    """rate 18 on the (48, 72) grid pads 3/4 zeros — still exact."""
    n, h, w, c, f = 1, 8, 10, 4, 3
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, c, f).astype(np.float32))
    for rate in (9, 11):
        np.testing.assert_allclose(
            np.asarray(conv3x3_atrous(x, k, rate)),
            np.asarray(_ref(x, k, rate)), rtol=1e-5, atol=1e-4)


def test_conv2d_layer_routes_and_matches(monkeypatch):
    from deepcam_tpu.models.layers import Conv2d

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 12, 18, 10).astype(np.float32))

    def run():
        m = Conv2d(6, 3, stride=1, padding=12, dilation=12,
                   dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)

        def loss(v, x):
            return jnp.sum(m.apply(v, x) ** 2)

        return m.apply(v, x), jax.grad(loss, argnums=(0, 1))(v, x)

    monkeypatch.setenv("DEEPCAM_ATROUS", "0")
    y_off, (gv_off, gx_off) = run()
    monkeypatch.setenv("DEEPCAM_ATROUS", "1")
    y_on, (gv_on, gx_on) = run()
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_on), np.asarray(gx_off),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gv_on["params"]["kernel"]),
        np.asarray(gv_off["params"]["kernel"]), rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("rate", [2, 6, 12, 18])
def test_s2b_fwd_and_grads_match_xla(rate):
    from deepcam_tpu.ops.atrous import conv3x3_atrous_s2b

    n, h, w, c, f = 2, 48, 72, 16, 8  # ASPP grid (rate 18 pads 48 -> 54)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, c, f).astype(np.float32))
    dy = jnp.asarray(rng.randn(n, h, w, f).astype(np.float32))

    y_ref, vjp_ref = jax.vjp(lambda x, k: _ref(x, k, rate), x, k)
    y, vjp = jax.vjp(lambda x, k: conv3x3_atrous_s2b(x, k, rate), x, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-4)
    dx_ref, dk_ref = vjp_ref(dy)
    dx, dk = vjp(dy)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-5, atol=1e-3)


def test_s2b_non_divisible_shapes():
    from deepcam_tpu.ops.atrous import conv3x3_atrous_s2b

    rng = np.random.RandomState(4)
    for (h, w, rate) in [(13, 9, 5), (8, 10, 9), (7, 7, 3)]:
        x = jnp.asarray(rng.randn(1, h, w, 4).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 4, 3).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(conv3x3_atrous_s2b(x, k, rate)),
            np.asarray(_ref(x, k, rate)), rtol=1e-5, atol=1e-4)


def test_conv2d_layer_routes_s2b(monkeypatch):
    from deepcam_tpu.models.layers import Conv2d

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 12, 18, 10).astype(np.float32))
    m = Conv2d(6, 3, stride=1, padding=6, dilation=6)
    v = m.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("DEEPCAM_ATROUS", "0")
    y_ref = m.apply(v, x)
    monkeypatch.setenv("DEEPCAM_ATROUS", "s2b")
    y = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-4)
