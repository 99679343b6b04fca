"""Parity of the deconv custom VJP (ops/deconv.py) against XLA autodiff
through the dilated schedule — the exact-x2 transposed conv of the decoder
(reference ``deeplab_xception.py:352-374``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcam_tpu.ops.deconv import _dilated_fwd, deconv3x3s2


def _ref_fwd(x, kernel):
    return _dilated_fwd(x, kernel)


@pytest.mark.parametrize("method", ["dilated", "d2s", "polyphase"])
@pytest.mark.parametrize("shape", [
    (2, 6, 8, 5, 7),     # odd channels
    (1, 12, 18, 16, 3),  # last_deconv class: F = n_classes
    (2, 4, 6, 8, 8),
    (1, 4, 6, 5, 24),    # F > 16: per-phase einsum wgrad path
])
def test_fwd_and_grads_match_xla(shape, method):
    n, h, w, c, f = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, c, f).astype(np.float32))
    dy = jnp.asarray(rng.randn(n, 2 * h, 2 * w, f).astype(np.float32))

    y_ref, vjp_ref = jax.vjp(_ref_fwd, x, k)
    y, vjp = jax.vjp(lambda x, k: deconv3x3s2(x, k, method), x, k)
    if method == "dilated":
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    else:
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-4)

    dx_ref, dk_ref = vjp_ref(dy)
    dx, dk = vjp(dy)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-5, atol=1e-3)


def test_bf16_grads_close_to_fp32():
    """bf16 operands: the custom wgrad upcasts before the product, so it can
    only be MORE accurate than the all-bf16 XLA chain; compare both to the
    fp32 truth and require the custom path within the XLA path's error."""
    n, h, w, c, f = 2, 8, 12, 16, 8
    rng = np.random.RandomState(1)
    x32 = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    k32 = jnp.asarray(rng.randn(3, 3, c, f).astype(np.float32))
    dy32 = jnp.asarray(rng.randn(n, 2 * h, 2 * w, f).astype(np.float32))

    _, vjp_true = jax.vjp(_ref_fwd, x32, k32)
    dk_true = np.asarray(vjp_true(dy32)[1])

    x, k, dy = (a.astype(jnp.bfloat16) for a in (x32, k32, dy32))
    _, vjp_xla = jax.vjp(_ref_fwd, x, k)
    _, vjp_cus = jax.vjp(deconv3x3s2, x, k)
    err_xla = np.abs(np.asarray(vjp_xla(dy)[1], np.float32) - dk_true).max()
    err_cus = np.abs(np.asarray(vjp_cus(dy)[1], np.float32) - dk_true).max()
    assert err_cus <= err_xla * 1.5 + 1e-6


def test_layer_uses_custom_vjp_and_matches(monkeypatch):
    """ConvTranspose2d(dilated) grads are identical with the VJP on/off."""
    import flax.linen as nn

    from deepcam_tpu.models.layers import ConvTranspose2d

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 6, 9, 10).astype(np.float32))

    def run():
        m = ConvTranspose2d(4, dtype=jnp.float32, method="dilated")
        v = m.init(jax.random.PRNGKey(0), x)

        def loss(v, x):
            return jnp.sum(m.apply(v, x) ** 2)

        return jax.grad(loss, argnums=(0, 1))(v, x)

    monkeypatch.setenv("DEEPCAM_DECONV_VJP", "0")
    gv_off, gx_off = run()
    monkeypatch.setenv("DEEPCAM_DECONV_VJP", "1")
    gv_on, gx_on = run()
    np.testing.assert_allclose(
        np.asarray(gx_on), np.asarray(gx_off), rtol=1e-5, atol=1e-4)
    k_on = gv_on["params"]["kernel"]
    k_off = gv_off["params"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(k_on), np.asarray(k_off), rtol=1e-5, atol=1e-3)
