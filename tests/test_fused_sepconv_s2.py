"""Parity tests for the fused stride-2 sepconv kernel
(ops/pallas/fused_sepconv_s2.py) in CPU interpret mode.

Reference composition: depthwise 3x3 / stride 2 / 'same' pad (1,1) →
pointwise 1x1 — the unfused XLA path of SeparableConv2dSame's tail form
(reference ``SeparableConv2d_same`` with stride 2,
``deeplab_xception.py:54-66``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcam_tpu.models.layers import conv2d
from deepcam_tpu.ops.pallas.fused_sepconv_s2 import (
    fused_sepconv_s2,
    fused_sepconv_s2_affine,
    fused_sepconv_s2_affine_v2,
    fused_sepconv_s2_v2,
)


def _ref(x, dwk, pwk, ab=None):
    if ab is not None:
        a, b = ab
        x = x * a.reshape(1, 1, 1, -1) + b.reshape(1, 1, 1, -1)
    c = x.shape[-1]
    y = conv2d(x, dwk[:, :, None, :], stride=2, padding=((1, 1), (1, 1)),
               groups=c)
    return conv2d(y, pwk[None, None], padding=0)


SHAPES = [
    (1, 8, 12, 8, 16),
    (2, 16, 24, 16, 16),
    (1, 12, 8, 24, 8),   # W < H, C not a lane multiple
    (2, 32, 12, 8, 24),  # multi-tile rows
]


@pytest.mark.parametrize("n,h,w,c,f", SHAPES)
@pytest.mark.parametrize("affine", [False, True])
def test_forward_parity(n, h, w, c, f, affine):
    rng = np.random.RandomState(hash((n, h, w, c, f, affine)) % 2**31)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    dwk = jnp.asarray(rng.randn(3, 3, c) * 0.3, jnp.float32)
    pwk = jnp.asarray(rng.randn(c, f) * 0.2, jnp.float32)
    if affine:
        a = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        y = fused_sepconv_s2_affine(x, a, b, dwk, pwk, True)
        y_ref = _ref(x, dwk, pwk, ab=(a, b))
    else:
        y = fused_sepconv_s2(x, dwk, pwk, True)
        y_ref = _ref(x, dwk, pwk)
    assert y.shape == (n, h // 2, w // 2, f)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,h,w,c,f", SHAPES[:3])
@pytest.mark.parametrize("affine", [False, True])
def test_gradient_parity(n, h, w, c, f, affine):
    rng = np.random.RandomState(hash((n, h, w, c, f, affine, 1)) % 2**31)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    dwk = jnp.asarray(rng.randn(3, 3, c) * 0.3, jnp.float32)
    pwk = jnp.asarray(rng.randn(c, f) * 0.2, jnp.float32)
    g = jnp.asarray(rng.randn(n, h // 2, w // 2, f), jnp.float32)

    if affine:
        a = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)

        def f_fused(x, a, b, dwk, pwk):
            return jnp.sum(fused_sepconv_s2_affine(x, a, b, dwk, pwk, True)
                           * g)

        def f_ref(x, a, b, dwk, pwk):
            return jnp.sum(_ref(x, dwk, pwk, ab=(a, b)) * g)

        grads = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(x, a, b, dwk, pwk)
        grads_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, a, b, dwk,
                                                             pwk)
    else:
        def f_fused(x, dwk, pwk):
            return jnp.sum(fused_sepconv_s2(x, dwk, pwk, True) * g)

        def f_ref(x, dwk, pwk):
            return jnp.sum(_ref(x, dwk, pwk) * g)

        grads = jax.grad(f_fused, argnums=(0, 1, 2))(x, dwk, pwk)
        grads_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, dwk, pwk)

    for got, want in zip(grads, grads_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_model_tail_matches_xla(monkeypatch):
    """SeparableConv2dSame stride-2 routes through the kernel under
    DEEPCAM_FUSED_S2=1 + forced-fused impl, with the identical parameter
    tree and matching output/gradients."""
    from deepcam_tpu.models.layers import SeparableConv2dSame, \
        set_sepconv_impl

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 24, 8), jnp.float32)
    mod = SeparableConv2dSame(features=12, kernel_size=3, stride=2,
                              dtype=jnp.float32)

    def run(impl, flag):
        monkeypatch.setenv("DEEPCAM_FUSED_S2", flag)
        set_sepconv_impl(impl)
        try:
            v = mod.init(jax.random.PRNGKey(0), x)

            def loss(p):
                return jnp.sum(mod.apply({"params": p}, x) ** 2)

            val, grads = jax.value_and_grad(loss)(v["params"])
            return v, val, grads
        finally:
            set_sepconv_impl("auto")

    v_f, val_f, g_f = run("fused", "1")
    v_x, val_x, g_x = run("xla", "0")
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_array_equal(np.asarray(p),
                                                   np.asarray(q)),
        v_f["params"], v_x["params"])
    np.testing.assert_allclose(float(val_f), float(val_x), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), rtol=1e-4, atol=1e-4),
        g_f, g_x)


def test_bf16_forward_close():
    """bf16 operands (the production dtype): fused vs unfused within bf16
    tolerance; also exercises the kernel's dtype handling in interpret."""
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(1, 16, 24, 16), jnp.bfloat16)
    a = jnp.asarray(rng.rand(16) + 0.5, jnp.bfloat16)
    b = jnp.asarray(rng.randn(16) * 0.1, jnp.bfloat16)
    dwk = jnp.asarray(rng.randn(3, 3, 16) * 0.3, jnp.bfloat16)
    pwk = jnp.asarray(rng.randn(16, 12) * 0.2, jnp.bfloat16)
    y = fused_sepconv_s2_affine(x, a, b, dwk, pwk, True)
    # reference path in mixed precision: emulate the unfused bf16 pipeline
    u = (x * a.reshape(1, 1, 1, -1) + b.reshape(1, 1, 1, -1))
    y_ref = conv2d(u, dwk[:, :, None, :], stride=2,
                   padding=((1, 1), (1, 1)), groups=16)
    y_ref = conv2d(y_ref, pwk[None, None], padding=0)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=0.05, atol=0.05)


def test_bf16_grads_finite():
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(1, 16, 24, 16), jnp.bfloat16)
    a = jnp.asarray(rng.rand(16) + 0.5, jnp.bfloat16)
    b = jnp.asarray(rng.randn(16) * 0.1, jnp.bfloat16)
    dwk = jnp.asarray(rng.randn(3, 3, 16) * 0.3, jnp.bfloat16)
    pwk = jnp.asarray(rng.randn(16, 12) * 0.2, jnp.bfloat16)

    def loss(x, a, b, dwk, pwk):
        return jnp.sum(fused_sepconv_s2_affine(
            x, a, b, dwk, pwk, True).astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, a, b, dwk, pwk)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


def test_xception_block_with_fold_matches_xla(monkeypatch):
    """Full XceptionBlock (rep units + stride-2 tail + skip) in train mode:
    the BN-fold (a, b) handoff into the fused s2 tail matches the unfused
    path's separate FMA within fp32 reduction tolerance."""
    from deepcam_tpu.models.layers import set_sepconv_impl
    from deepcam_tpu.models.xception import XceptionBlock

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 16, 24, 8), jnp.float32)
    blk = XceptionBlock(out_ch=12, reps=2, stride=2, dtype=jnp.float32)

    def run(impl, flag):
        monkeypatch.setenv("DEEPCAM_FUSED_S2", flag)
        set_sepconv_impl(impl)
        try:
            v = blk.init(jax.random.PRNGKey(1), x, train=True)

            def loss(p):
                out, _ = blk.apply(
                    {"params": p, "batch_stats": v["batch_stats"]},
                    x, train=True, mutable=["batch_stats"])
                return jnp.sum(out ** 2)

            val, grads = jax.value_and_grad(loss)(v["params"])
            return v, val, grads
        finally:
            set_sepconv_impl("auto")

    v_f, val_f, g_f = run("fused", "1")
    v_x, val_x, g_x = run("xla", "0")
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_array_equal(np.asarray(p),
                                                   np.asarray(q)),
        v_f["params"], v_x["params"])
    np.testing.assert_allclose(float(val_f), float(val_x), rtol=1e-4)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), rtol=2e-3, atol=2e-3),
        g_f, g_x)


# ---------------------------------------------------------------------------
# v2: in-kernel phase split (no XLA-side glue)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n,h,w,c,f", SHAPES)
@pytest.mark.parametrize("affine", [False, True])
def test_v2_forward_parity(n, h, w, c, f, affine):
    rng = np.random.RandomState(hash((n, h, w, c, f, affine, 2)) % 2**31)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    dwk = jnp.asarray(rng.randn(3, 3, c) * 0.3, jnp.float32)
    pwk = jnp.asarray(rng.randn(c, f) * 0.2, jnp.float32)
    if affine:
        a = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        y = fused_sepconv_s2_affine_v2(x, a, b, dwk, pwk, True)
        y_ref = _ref(x, dwk, pwk, ab=(a, b))
        y_v1 = fused_sepconv_s2_affine(x, a, b, dwk, pwk, True)
    else:
        y = fused_sepconv_s2_v2(x, dwk, pwk, True)
        y_ref = _ref(x, dwk, pwk)
        y_v1 = fused_sepconv_s2(x, dwk, pwk, True)
    assert y.shape == (n, h // 2, w // 2, f)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    if affine:
        # the affine FMA's mul+add may or may not contract to a fused
        # multiply-add depending on how the backend compiles each kernel
        # -> 1-ULP-scale noise vs v1; the tap-sum order itself is identical
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_v1),
                                   rtol=1e-4, atol=1e-6)
    else:
        # same fp32 tap ORDER as v1, but on multi-tile shapes the row-tile
        # pickers may choose different th (v2 caps at h2-1, v1 allows h2),
        # changing dot accumulation grouping -> ULP-scale noise, not bits
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_v1),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n,h,w,c,f", SHAPES[:3])
@pytest.mark.parametrize("affine", [False, True])
def test_v2_gradient_parity(n, h, w, c, f, affine):
    rng = np.random.RandomState(hash((n, h, w, c, f, affine, 3)) % 2**31)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    dwk = jnp.asarray(rng.randn(3, 3, c) * 0.3, jnp.float32)
    pwk = jnp.asarray(rng.randn(c, f) * 0.2, jnp.float32)
    g = jnp.asarray(rng.randn(n, h // 2, w // 2, f), jnp.float32)

    if affine:
        a = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)

        def f_fused(x, a, b, dwk, pwk):
            return jnp.sum(
                fused_sepconv_s2_affine_v2(x, a, b, dwk, pwk, True) * g)

        def f_ref(x, a, b, dwk, pwk):
            return jnp.sum(_ref(x, dwk, pwk, ab=(a, b)) * g)

        grads = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(x, a, b, dwk, pwk)
        grads_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, a, b, dwk,
                                                             pwk)
    else:
        def f_fused(x, dwk, pwk):
            return jnp.sum(fused_sepconv_s2_v2(x, dwk, pwk, True) * g)

        def f_ref(x, dwk, pwk):
            return jnp.sum(_ref(x, dwk, pwk) * g)

        grads = jax.grad(f_fused, argnums=(0, 1, 2))(x, dwk, pwk)
        grads_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, dwk, pwk)

    for got, want in zip(grads, grads_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_model_tail_v2_matches_xla(monkeypatch):
    """DEEPCAM_FUSED_S2=2 routes the stride-2 tail through the v2 kernel
    with matching output/gradients vs the unfused path."""
    from deepcam_tpu.models.layers import SeparableConv2dSame, \
        set_sepconv_impl

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 16, 24, 8), jnp.float32)
    mod = SeparableConv2dSame(features=12, kernel_size=3, stride=2,
                              dtype=jnp.float32)

    def run(impl, flag):
        monkeypatch.setenv("DEEPCAM_FUSED_S2", flag)
        set_sepconv_impl(impl)
        try:
            v = mod.init(jax.random.PRNGKey(0), x)

            def loss(p):
                return jnp.sum(mod.apply({"params": p}, x) ** 2)

            val, grads = jax.value_and_grad(loss)(v["params"])
            return v, val, grads
        finally:
            set_sepconv_impl("auto")

    v_f, val_f, g_f = run("fused", "2")
    v_x, val_x, g_x = run("xla", "0")
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_array_equal(np.asarray(p),
                                                   np.asarray(q)),
        v_f["params"], v_x["params"])
    np.testing.assert_allclose(float(val_f), float(val_x), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), rtol=1e-4, atol=1e-4),
        g_f, g_x)


def test_v2_bf16_forward_matches_v1():
    """bf16 (production dtype): v2 vs v1 within bf16 rounding of the
    affine-FMA contraction noise (see test_v2_forward_parity)."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 16, 24, 16), jnp.bfloat16)
    a = jnp.asarray(rng.rand(16) + 0.5, jnp.bfloat16)
    b = jnp.asarray(rng.randn(16) * 0.1, jnp.bfloat16)
    dwk = jnp.asarray(rng.randn(3, 3, 16) * 0.3, jnp.bfloat16)
    pwk = jnp.asarray(rng.randn(16, 12) * 0.2, jnp.bfloat16)
    y1 = fused_sepconv_s2_affine(x, a, b, dwk, pwk, True)
    y2 = fused_sepconv_s2_affine_v2(x, a, b, dwk, pwk, True)
    np.testing.assert_allclose(np.asarray(y1, np.float32),
                               np.asarray(y2, np.float32),
                               rtol=0.02, atol=0.02)
    # the PLAIN (no-affine) kernels are bit-exact even in bf16
    y1p = fused_sepconv_s2(x, dwk, pwk, True)
    y2p = fused_sepconv_s2_v2(x, dwk, pwk, True)
    np.testing.assert_array_equal(np.asarray(y1p, np.float32),
                                  np.asarray(y2p, np.float32))


def test_plain_w_fallback_matches_affine(monkeypatch):
    """DEEPCAM_FUSED_S2_PLAIN_W=N: wide (>= N columns) affine tails run the
    BN-apply as an XLA FMA + the PLAIN v2 kernel — the block1 fallback for
    the server-side Mosaic compile failure (r3 wave 5).  Output and grads
    must match the in-kernel affine form."""
    from deepcam_tpu.models.layers import SeparableConv2dSame, \
        set_sepconv_impl

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 16, 576, 8), jnp.float32)
    a = jnp.asarray(rng.rand(8) + 0.5, jnp.float32)
    b = jnp.asarray(0.1 * rng.randn(8), jnp.float32)
    mod = SeparableConv2dSame(features=8, kernel_size=3, stride=2,
                              dtype=jnp.float32)

    def run(plain_w):
        monkeypatch.setenv("DEEPCAM_FUSED_S2", "2")
        if plain_w:
            monkeypatch.setenv("DEEPCAM_FUSED_S2_PLAIN_W", plain_w)
        else:
            monkeypatch.delenv("DEEPCAM_FUSED_S2_PLAIN_W", raising=False)
        set_sepconv_impl("fused")
        try:
            v = mod.init(jax.random.PRNGKey(0), x, bn_fold=(a, b))

            def loss(p, xx):
                return jnp.sum(
                    mod.apply({"params": p}, xx, bn_fold=(a, b)) ** 2)

            val, grads = jax.value_and_grad(loss, argnums=(0, 1))(
                v["params"], x)
            return val, grads
        finally:
            set_sepconv_impl("auto")
            monkeypatch.delenv("DEEPCAM_FUSED_S2_PLAIN_W", raising=False)

    val_aff, g_aff = run(None)
    val_pw, g_pw = run("512")
    np.testing.assert_allclose(float(val_aff), float(val_pw), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), rtol=1e-4, atol=1e-4),
        g_aff, g_pw)
