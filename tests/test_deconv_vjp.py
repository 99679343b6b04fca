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


# ---------------------------------------------------------------------------
# block-space output variant
# ---------------------------------------------------------------------------

class TestBlocksVariant:
    """``deconv3x3s2_blocks``: forward equals ``space_to_blocks`` of the
    full-res deconv, and the never-leaves-block-space backward matches
    autodiff of that composition."""

    @pytest.mark.parametrize("n,h,w,c,f", [
        (2, 8, 6, 16, 3),     # last_deconv-like tiny F
        (1, 6, 10, 8, 24),    # F > C
        (2, 10, 8, 24, 16),
    ])
    def test_forward_and_grads(self, n, h, w, c, f):
        from deepcam_tpu.ops.deconv import (
            deconv3x3s2_blocks,
            space_to_blocks,
        )

        rng = np.random.RandomState(11)
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
        k = jnp.asarray(0.3 * rng.randn(3, 3, c, f), jnp.float32)
        ct = jnp.asarray(rng.randn(n, h, w, 4 * f), jnp.float32)

        got = deconv3x3s2_blocks(x, k)
        want = space_to_blocks(_ref_fwd(x, k)).reshape(n, h, w, 4 * f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

        def loss_blocks(x, k):
            return jnp.sum(deconv3x3s2_blocks(x, k) * ct)

        def loss_ref(x, k):
            yb = space_to_blocks(_ref_fwd(x, k)).reshape(n, h, w, 4 * f)
            return jnp.sum(yb * ct)

        gx, gk = jax.grad(loss_blocks, argnums=(0, 1))(x, k)
        rx, rk = jax.grad(loss_ref, argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-4, atol=1e-4, err_msg="dx")
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                                   rtol=1e-4, atol=1e-4, err_msg="dk")

    def test_space_to_blocks_roundtrip(self):
        from deepcam_tpu.ops.deconv import space_to_blocks

        rng = np.random.RandomState(12)
        y = jnp.asarray(rng.randn(2, 8, 6, 3), jnp.float32)
        yb = space_to_blocks(y)
        assert yb.shape == (2, 4, 3, 4, 3)
        # block (a, b) at tile (i, j) is full-res pixel (2i+a, 2j+b)
        np.testing.assert_array_equal(
            np.asarray(yb[:, 1, 2, 3]), np.asarray(y[:, 3, 5]))
        np.testing.assert_array_equal(
            np.asarray(yb[:, 0, 0, 1]), np.asarray(y[:, 0, 1]))

    def test_labels_match_logits_blocking(self):
        """space_to_blocks on (N, H, W) labels uses the same (a, b) order
        as on (N, H, W, C) logits — the pairing the block loss relies on."""
        from deepcam_tpu.ops.deconv import space_to_blocks

        rng = np.random.RandomState(13)
        logits = jnp.asarray(rng.randn(2, 8, 6, 3), jnp.float32)
        labels = jnp.asarray(rng.randint(0, 3, (2, 8, 6)), jnp.int32)
        lb = space_to_blocks(logits)
        tb = space_to_blocks(labels)
        # the (pred, label) multiset of pairs is preserved position-wise
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(lb, -1).reshape(-1)),
            np.asarray(space_to_blocks(jnp.argmax(logits, -1)).reshape(-1)))
        assert tb.shape == lb.shape[:-1]


class TestBlocks2Variant:
    """``deconv3x3s2_blocks2``: consuming block-space input and emitting x4
    blocks equals blocks⁻¹ → full-res deconv → factor-4 space_to_blocks."""

    @pytest.mark.parametrize("n,h,w,c,f", [
        (2, 6, 5, 8, 3),
        (1, 4, 7, 16, 5),
    ])
    def test_forward_and_grads(self, n, h, w, c, f):
        from deepcam_tpu.ops.deconv import (
            deconv3x3s2_blocks,
            deconv3x3s2_blocks2,
            space_to_blocks,
        )

        rng = np.random.RandomState(21)
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
        k1 = jnp.asarray(0.3 * rng.randn(3, 3, c, c), jnp.float32)
        k2 = jnp.asarray(0.3 * rng.randn(3, 3, c, f), jnp.float32)
        ct = jnp.asarray(rng.randn(n, h, w, 16 * f), jnp.float32)

        def composite(x, k1, k2):
            # stage 1 in block space, relu between, stage 2 in block space
            z = jnp.maximum(deconv3x3s2_blocks(x, k1), 0)
            return deconv3x3s2_blocks2(z, k2)

        def reference(x, k1, k2):
            mid = jnp.maximum(_ref_fwd(x, k1), 0)   # full-res 2x
            y = _ref_fwd(mid, k2)                   # full-res 4x
            return space_to_blocks(y, 4).reshape(n, h, w, 16 * f)

        got = composite(x, k1, k2)
        want = reference(x, k1, k2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

        g = jax.grad(lambda *a: jnp.sum(composite(*a) * ct),
                     argnums=(0, 1, 2))(x, k1, k2)
        r = jax.grad(lambda *a: jnp.sum(reference(*a) * ct),
                     argnums=(0, 1, 2))(x, k1, k2)
        for g_, r_, name in zip(g, r, ("dx", "dk1", "dk2")):
            np.testing.assert_allclose(
                np.asarray(g_), np.asarray(r_), rtol=1e-4, atol=1e-4,
                err_msg=name)
