"""Parity tests for the fused [relu→]depthwise→pointwise Pallas kernel.

Compares forward values AND all gradients (dx, d_dw, d_pw) against the
unfused composition the model uses today (ops/depthwise.py depthwise3x3 +
lax 1x1 conv), in Pallas interpret mode on CPU.  Shapes exercise: multiple
row tiles, a single row tile (nh==1), non-128 channel counts, C != F,
dilation 2, and pre_relu on/off.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepcam_tpu.ops.pallas.fused_sepconv import fused_sepconv
from deepcam_tpu.models.layers import fixed_padding


def _reference(x, dwk, pwk, pre_relu, dilation):
    """The unfused XLA path: [relu →] depthwise 'same' → pointwise."""
    from jax import lax

    if pre_relu:
        x = jnp.maximum(x, 0)
    pad = fixed_padding(3, dilation)
    y = lax.conv_general_dilated(
        x, dwk[:, :, None, :],
        window_strides=(1, 1), padding=(pad, pad),
        rhs_dilation=(dilation, dilation),
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return lax.conv_general_dilated(
        y, pwk[None, None],
        window_strides=(1, 1), padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


CASES = [
    # (N, H, W, C, F, pre_relu, dilation)
    (2, 16, 12, 16, 24, True, 1),    # multi-tile rows, C != F
    (1, 8, 12, 8, 8, True, 1),       # nh == 1 (whole image in one tile)
    (2, 12, 10, 24, 16, False, 1),   # no relu
    (1, 16, 12, 16, 16, True, 2),    # dilation 2 (exit-flow case)
    (1, 24, 9, 40, 16, True, 1),     # odd W, C not a lane multiple
]


@pytest.mark.parametrize("n,h,w,c,f,pre_relu,dilation",
                         [CASES[0], CASES[3], CASES[4]])
def test_csplit_gradient_parity(n, h, w, c, f, pre_relu, dilation,
                                monkeypatch):
    """DEEPCAM_FUSED_CSPLIT=2 (chunk-major backward tap loops, round-5
    c-minor split) — bit-level question is only op ORDER inside fp32
    accumulation, so the parity bar matches the unsplit test's."""
    monkeypatch.setenv("DEEPCAM_FUSED_CSPLIT", "2")
    monkeypatch.setenv("DEEPCAM_FUSED_CSPLIT_MINH", "8")
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.float32)
    pwk = jnp.asarray(0.3 * rng.randn(c, f), jnp.float32)
    ct = jnp.asarray(rng.randn(n, h, w, f), jnp.float32)

    def loss_fused(x, dwk, pwk):
        return jnp.sum(fused_sepconv(x, dwk, pwk, pre_relu, dilation, True)
                       * ct)

    def loss_ref(x, dwk, pwk):
        return jnp.sum(_reference(x, dwk, pwk, pre_relu, dilation) * ct)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, dwk, pwk)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, dwk, pwk)
    for g, r in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n,h,w,c,f,pre_relu,dilation", CASES)
def test_forward_parity(n, h, w, c, f, pre_relu, dilation):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.float32)
    pwk = jnp.asarray(0.3 * rng.randn(c, f), jnp.float32)

    got = fused_sepconv(x, dwk, pwk, pre_relu, dilation, True)
    want = _reference(x, dwk, pwk, pre_relu, dilation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("roll", ["0", "1"])
@pytest.mark.parametrize("n,h,w,c,f,pre_relu,dilation", CASES)
def test_gradient_parity(n, h, w, c, f, pre_relu, dilation, roll,
                         monkeypatch):
    # both tap-shift forms: fp32 pltpu.roll rotate (default) and the
    # zero-block-concat fallback (DEEPCAM_FUSED_ROLL=0)
    monkeypatch.setenv("DEEPCAM_FUSED_ROLL", roll)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.float32)
    pwk = jnp.asarray(0.3 * rng.randn(c, f), jnp.float32)
    ct = jnp.asarray(rng.randn(n, h, w, f), jnp.float32)

    def loss_fused(x, dwk, pwk):
        return jnp.sum(fused_sepconv(x, dwk, pwk, pre_relu, dilation, True)
                       * ct)

    def loss_ref(x, dwk, pwk):
        return jnp.sum(_reference(x, dwk, pwk, pre_relu, dilation) * ct)

    gx, gdw, gpw = jax.grad(loss_fused, argnums=(0, 1, 2))(x, dwk, pwk)
    rx, rdw, rpw = jax.grad(loss_ref, argnums=(0, 1, 2))(x, dwk, pwk)

    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gdw), np.asarray(rdw),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gpw), np.asarray(rpw),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n,h,w,c,f,pre_relu,dilation", CASES)
def test_affine_parity(n, h, w, c, f, pre_relu, dilation):
    """BN-apply-folded kernel == affine then the unfused composition,
    forward and all five gradients (dx, da, db, d_dw, d_pw).  b is offset
    positive so relu(0*a+b) != 0 — catches halo rows that miss the
    post-affine zeroing."""
    from deepcam_tpu.ops.pallas.fused_sepconv import fused_sepconv_affine

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    a = jnp.asarray(1.0 + 0.3 * rng.randn(c), jnp.float32)
    b = jnp.asarray(0.5 + 0.3 * rng.randn(c), jnp.float32)
    dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.float32)
    pwk = jnp.asarray(0.3 * rng.randn(c, f), jnp.float32)
    ct = jnp.asarray(rng.randn(n, h, w, f), jnp.float32)

    def loss_fused(x, a, b, dwk, pwk):
        y = fused_sepconv_affine(x, a, b, dwk, pwk, pre_relu, dilation, True)
        return jnp.sum(y * ct)

    def loss_ref(x, a, b, dwk, pwk):
        return jnp.sum(_reference(x * a + b, dwk, pwk, pre_relu, dilation)
                       * ct)

    got = fused_sepconv_affine(x, a, b, dwk, pwk, pre_relu, dilation, True)
    want = _reference(x * a + b, dwk, pwk, pre_relu, dilation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    gs = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, a, b, dwk, pwk)
    rs = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, a, b, dwk, pwk)
    for g_, r_, name in zip(gs, rs, ("dx", "da", "db", "ddw", "dpw")):
        np.testing.assert_allclose(
            np.asarray(g_), np.asarray(r_), rtol=1e-4, atol=1e-4,
            err_msg=name)


def test_bf16_forward_close():
    """bf16 in/out matches the bf16 unfused path within bf16 tolerance."""
    rng = np.random.RandomState(2)
    n, h, w, c, f = 2, 16, 12, 16, 16
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
    dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.bfloat16)
    pwk = jnp.asarray(0.3 * rng.randn(c, f), jnp.bfloat16)

    got = fused_sepconv(x, dwk, pwk, True, 1, True).astype(jnp.float32)
    want = _reference(x, dwk, pwk, True, 1).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)


class TestModelWiring:
    """The fused path through the real flax modules: identical param tree,
    matching outputs and grads vs the unfused path (interpret mode, small
    XceptionBlock)."""

    def _block(self):
        from deepcam_tpu.models.xception import XceptionBlock

        return XceptionBlock(out_ch=16, reps=3, stride=1, dtype=jnp.float32)

    def _run(self, impl):
        from deepcam_tpu.models import layers

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(1, 8, 12, 16), jnp.float32)
        blk = self._block()
        layers.set_sepconv_impl(impl)
        try:
            variables = blk.init(jax.random.PRNGKey(0), x, train=True)

            def loss(params):
                y, _ = blk.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"],
                )
                return jnp.sum(y * y), y

            (l, y), grads = jax.value_and_grad(loss, has_aux=True)(
                variables["params"])
        finally:
            layers.set_sepconv_impl("auto")
        return variables, l, y, grads

    def test_fused_matches_xla(self):
        v_f, l_f, y_f, g_f = self._run("fused")
        v_x, l_x, y_x, g_x = self._run("xla")

        # identical parameter trees (same paths, shapes, AND init values)
        flat_f = jax.tree_util.tree_leaves_with_path(v_f["params"])
        flat_x = dict(jax.tree_util.tree_leaves_with_path(v_x["params"]))
        assert len(flat_f) == len(flat_x)
        for path, leaf in flat_f:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(flat_x[path]))

        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_x),
                                   rtol=1e-5, atol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
            g_f, g_x,
        )


# ---------------------------------------------------------------------------
# stats-emitting variants
# ---------------------------------------------------------------------------

class TestStatsVariants:
    """``fused_sepconv_stats`` / ``fused_sepconv_affine_stats``: the tile
    partial (Σy, Σy²) outputs and the exactness of the stats cotangent
    path (dy += gs1 + 2·y·gs2) against explicit XLA reductions."""

    def test_partials_sum_to_reductions(self):
        from deepcam_tpu.ops.pallas.fused_sepconv import fused_sepconv_stats

        rng = np.random.RandomState(5)
        n, h, w, c, f = 2, 16, 12, 16, 24
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
        dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.float32)
        pwk = jnp.asarray(0.3 * rng.randn(c, f), jnp.float32)

        y, s1, s2 = fused_sepconv_stats(x, dwk, pwk, True, 1, True)
        y32 = np.asarray(y, np.float64)
        assert s1.shape == (f,) and s2.shape == (f,)
        np.testing.assert_allclose(
            np.asarray(s1), y32.sum((0, 1, 2)), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s2), (y32 * y32).sum((0, 1, 2)),
            rtol=1e-5, atol=1e-5)
        # y itself is unchanged vs the plain kernel
        np.testing.assert_array_equal(
            np.asarray(y), np.asarray(fused_sepconv(x, dwk, pwk, True, 1,
                                                    True)))

    @pytest.mark.parametrize("affine", [False, True])
    def test_bn_style_gradient_parity(self, affine):
        """Loss normalizes y with mean/var derived from the kernel stats —
        gradients must equal the same loss with mean/var reduced from y
        directly (the unfused BN path)."""
        from deepcam_tpu.ops.pallas.fused_sepconv import (
            fused_sepconv_affine_stats,
            fused_sepconv_stats,
        )

        rng = np.random.RandomState(6)
        n, h, w, c, f = 2, 16, 12, 16, 16
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
        a = jnp.asarray(1.0 + 0.3 * rng.randn(c), jnp.float32)
        b = jnp.asarray(0.3 * rng.randn(c), jnp.float32)
        dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.float32)
        pwk = jnp.asarray(0.3 * rng.randn(c, f), jnp.float32)
        ct = jnp.asarray(rng.randn(n, h, w, f), jnp.float32)
        cnt = n * h * w

        def norm_loss(y, mean, var):
            yn = (y - mean) * jax.lax.rsqrt(var + 1e-5)
            return jnp.sum(yn * ct)

        def loss_stats(x, dwk, pwk):
            if affine:
                y, s1, s2 = fused_sepconv_affine_stats(
                    x, a, b, dwk, pwk, True, 1, True)
            else:
                y, s1, s2 = fused_sepconv_stats(x, dwk, pwk, True, 1, True)
            mean = s1 / cnt
            var = s2 / cnt - mean * mean
            return norm_loss(y, mean, var)

        def loss_ref(x, dwk, pwk):
            xin = x * a + b if affine else x
            y = _reference(xin, dwk, pwk, True, 1)
            mean = jnp.mean(y, axis=(0, 1, 2))
            var = jnp.mean(y * y, axis=(0, 1, 2)) - mean * mean
            return norm_loss(y, mean, var)

        gs = jax.grad(loss_stats, argnums=(0, 1, 2))(x, dwk, pwk)
        rs = jax.grad(loss_ref, argnums=(0, 1, 2))(x, dwk, pwk)
        for g_, r_, name in zip(gs, rs, ("dx", "ddw", "dpw")):
            np.testing.assert_allclose(
                np.asarray(g_), np.asarray(r_), rtol=1e-4, atol=1e-4,
                err_msg=name)

    @pytest.mark.parametrize("fold", [False, True])
    def test_model_stats_matches_plain(self, fold):
        """XceptionBlock with fused_stats on vs off (both fused, train
        mode, with and without the BN-apply fold): outputs, grads, and
        batch-stat updates agree."""
        from deepcam_tpu.models import layers
        from deepcam_tpu.models.xception import XceptionBlock

        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(1, 8, 12, 16), jnp.float32)
        from deepcam_tpu.models.xception import XceptionBlock

        blk = XceptionBlock(out_ch=16, reps=3, stride=1, dtype=jnp.float32)

        def run(stats_on):
            prev = layers.fused_stats_active()
            prev_fold = layers.bn_fold_active()
            layers.set_sepconv_impl("fused")
            layers.set_fused_stats(stats_on)
            layers.set_bn_fold(fold)
            try:
                variables = blk.init(jax.random.PRNGKey(0), x, train=True)

                def loss(params):
                    y, upd = blk.apply(
                        {"params": params,
                         "batch_stats": variables["batch_stats"]},
                        x, train=True, mutable=["batch_stats"],
                    )
                    return jnp.sum(y * y), (y, upd)

                (l, (y, upd)), grads = jax.value_and_grad(
                    loss, has_aux=True)(variables["params"])
            finally:
                layers.set_fused_stats(prev)
                layers.set_bn_fold(prev_fold)
                layers.set_sepconv_impl("auto")
            return l, y, upd, grads

        l_s, y_s, u_s, g_s = run(True)
        l_p, y_p, u_p, g_p = run(False)
        np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_p),
                                   rtol=1e-5, atol=1e-5)
        jax.tree_util.tree_map(
            lambda p, q: np.testing.assert_allclose(
                np.asarray(p), np.asarray(q), rtol=1e-4, atol=1e-4),
            (u_s, g_s), (u_p, g_p),
        )


# ---------------------------------------------------------------------------
# unpadded (clamped-window) operands
# ---------------------------------------------------------------------------

class TestNopadWindows:
    """DEEPCAM_FUSED_NOPAD: unpadded operands with clamped Element windows
    and in-kernel edge fix-up must match the padded path exactly.  Small
    row tiles are forced (DEEPCAM_FUSED_TH) so the grid has real first/
    middle/last tiles."""

    @pytest.mark.parametrize("n,h,w,c,f,pre_relu,dilation", [
        (2, 16, 12, 16, 24, True, 1),   # 4 tiles
        (1, 16, 12, 16, 16, True, 2),   # dilation-2 halo
        (2, 12, 10, 24, 16, False, 1),  # 3 tiles, no relu
    ])
    def test_matches_padded(self, n, h, w, c, f, pre_relu, dilation,
                            monkeypatch):
        monkeypatch.setenv("DEEPCAM_FUSED_TH", "4")
        rng = np.random.RandomState(9)
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
        dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.float32)
        pwk = jnp.asarray(0.3 * rng.randn(c, f), jnp.float32)
        ct = jnp.asarray(rng.randn(n, h, w, f), jnp.float32)

        def run(flag):
            monkeypatch.setenv("DEEPCAM_FUSED_NOPAD", flag)

            def loss(x, dwk, pwk):
                return jnp.sum(
                    fused_sepconv(x, dwk, pwk, pre_relu, dilation, True)
                    * ct)

            y = fused_sepconv(x, dwk, pwk, pre_relu, dilation, True)
            g = jax.grad(loss, argnums=(0, 1, 2))(x, dwk, pwk)
            return y, g

        y_n, g_n = run("1")
        y_p, g_p = run("0")
        # the inserted edge-select ops re-cluster XLA fusions → fp32
        # reassociation at the 1e-7 level; values are otherwise identical
        np.testing.assert_allclose(np.asarray(y_n), np.asarray(y_p),
                                   rtol=1e-5, atol=1e-6)
        for a, b, name in zip(g_n, g_p, ("dx", "ddw", "dpw")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
                err_msg=name)

    def test_affine_stats_matches_padded(self, monkeypatch):
        from deepcam_tpu.ops.pallas.fused_sepconv import (
            fused_sepconv_affine_stats,
        )

        monkeypatch.setenv("DEEPCAM_FUSED_TH", "4")
        n, h, w, c, f = 2, 16, 12, 16, 16
        rng = np.random.RandomState(10)
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
        a = jnp.asarray(1.0 + 0.3 * rng.randn(c), jnp.float32)
        b = jnp.asarray(0.3 * rng.randn(c), jnp.float32)
        dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.float32)
        pwk = jnp.asarray(0.3 * rng.randn(c, f), jnp.float32)
        ct = jnp.asarray(rng.randn(n, h, w, f), jnp.float32)

        def run(flag):
            monkeypatch.setenv("DEEPCAM_FUSED_NOPAD", flag)

            def loss(x, a, b, dwk, pwk):
                y, s1, s2 = fused_sepconv_affine_stats(
                    x, a, b, dwk, pwk, True, 1, True)
                mean = s1 / (n * h * w)
                var = s2 / (n * h * w) - mean * mean
                return jnp.sum((y - mean) * jax.lax.rsqrt(var + 1e-5) * ct)

            y, s1, s2 = fused_sepconv_affine_stats(
                x, a, b, dwk, pwk, True, 1, True)
            g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, a, b, dwk, pwk)
            return (y, s1, s2), g

        o_n, g_n = run("1")
        o_p, g_p = run("0")
        for a_, b_ in zip(o_n, o_p):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=1e-5, atol=1e-6)
        for a_, b_, name in zip(g_n, g_p, ("dx", "da", "db", "ddw", "dpw")):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=1e-5, atol=1e-5,
                err_msg=name)

    @pytest.mark.parametrize("affine", [False, True])
    def test_inkernel_stats_adjust_matches_xla(self, affine, monkeypatch):
        """DEEPCAM_STATS_INKERNEL=1 (nopad mode): the backward kernel's
        in-kernel ``gt += gs1 + 2·y·gs2`` matches the XLA-side adjust."""
        from deepcam_tpu.ops.pallas.fused_sepconv import (
            fused_sepconv_affine_stats,
            fused_sepconv_stats,
        )

        monkeypatch.setenv("DEEPCAM_FUSED_TH", "4")
        monkeypatch.setenv("DEEPCAM_FUSED_NOPAD", "1")
        n, h, w, c, f = 2, 16, 12, 16, 16
        rng = np.random.RandomState(14)
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
        a = jnp.asarray(1.0 + 0.3 * rng.randn(c), jnp.float32)
        b = jnp.asarray(0.3 * rng.randn(c), jnp.float32)
        dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.float32)
        pwk = jnp.asarray(0.3 * rng.randn(c, f), jnp.float32)
        ct = jnp.asarray(rng.randn(n, h, w, f), jnp.float32)
        cnt = n * h * w

        def loss(x, a, b, dwk, pwk):
            if affine:
                y, s1, s2 = fused_sepconv_affine_stats(
                    x, a, b, dwk, pwk, True, 1, True)
            else:
                y, s1, s2 = fused_sepconv_stats(x, dwk, pwk, True, 1, True)
            mean = s1 / cnt
            var = s2 / cnt - mean * mean
            return jnp.sum((y - mean) * jax.lax.rsqrt(var + 1e-5) * ct)

        def run(flag):
            monkeypatch.setenv("DEEPCAM_STATS_INKERNEL", flag)
            return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
                x, a, b, dwk, pwk)

        g_k = run("1")
        g_x = run("0")
        for a_, b_, name in zip(g_k, g_x,
                                ("dx", "da", "db", "ddw", "dpw")):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=1e-5, atol=1e-5,
                err_msg=name)


class TestMinRowsGate:
    """DEEPCAM_FUSED_MIN_ROWS routes tiny-spatial units to the XLA path
    (r3 trace: the exit-flow (24, 36) kernel calls degenerate) with an
    identical param tree and matching numerics."""

    def test_min_rows_routes_to_xla(self, monkeypatch):
        from deepcam_tpu.models import layers

        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(1, 8, 12, 16), jnp.float32)
        from deepcam_tpu.models.xception import XceptionBlock

        blk = XceptionBlock(out_ch=16, reps=3, stride=1, dtype=jnp.float32)

        def run():
            layers.set_sepconv_impl("fused")
            try:
                variables = blk.init(jax.random.PRNGKey(0), x, train=True)
                y, _ = blk.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
            finally:
                layers.set_sepconv_impl("auto")
            return variables, y

        v_f, y_f = run()
        monkeypatch.setenv("DEEPCAM_FUSED_MIN_ROWS", "64")  # h=8 < 64 -> XLA
        v_g, y_g = run()

        flat_f = jax.tree_util.tree_leaves_with_path(v_f["params"])
        flat_g = dict(jax.tree_util.tree_leaves_with_path(v_g["params"]))
        assert len(flat_f) == len(flat_g)
        for path, leaf in flat_f:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(flat_g[path]))
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_g),
                                   rtol=1e-5, atol=1e-5)

    def test_max_dil_routes_to_xla(self, monkeypatch):
        """DEEPCAM_FUSED_MAX_DIL=1 sends the exit-flow d=2 units to XLA
        while dilation-1 units stay fused; param tree and numerics match."""
        from deepcam_tpu.models import layers

        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.randn(1, 8, 12, 16), jnp.float32)
        from deepcam_tpu.models.xception import XceptionBlock

        blk = XceptionBlock(out_ch=16, reps=3, stride=1, dilation=2,
                            dtype=jnp.float32)

        def run():
            layers.set_sepconv_impl("fused")
            try:
                variables = blk.init(jax.random.PRNGKey(0), x, train=True)
                y, _ = blk.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
            finally:
                layers.set_sepconv_impl("auto")
            return variables, y

        v_f, y_f = run()
        monkeypatch.setenv("DEEPCAM_FUSED_MAX_DIL", "1")  # d=2 > 1 -> XLA
        v_g, y_g = run()

        flat_f = jax.tree_util.tree_leaves_with_path(v_f["params"])
        flat_g = dict(jax.tree_util.tree_leaves_with_path(v_g["params"]))
        assert len(flat_f) == len(flat_g)
        for path, leaf in flat_f:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(flat_g[path]))
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_g),
                                   rtol=1e-5, atol=1e-5)


class TestBoundaryFold:
    """Block-boundary variant: r = relu(x*a + b + skip) in-kernel, r
    emitted for the skip path (fused_sepconv_boundary[_stats])."""

    BCASES = [
        (2, 16, 12, 16, 24),
        (1, 8, 12, 8, 8),      # nh == 1
        (1, 2, 3, 8, 8),       # degenerate middle-flow-at-(32,48) shape
        (1, 24, 9, 40, 16),    # odd W, C not a lane multiple
    ]

    @pytest.mark.parametrize("n,h,w,c,f", BCASES)
    def test_forward_parity(self, n, h, w, c, f):
        from deepcam_tpu.ops.pallas.fused_sepconv import (
            fused_sepconv_boundary,
        )

        rng = np.random.RandomState(hash((n, h, w, c, f)) % 2**31)
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
        a = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        b = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        sk = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
        dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.float32)
        pwk = jnp.asarray(0.2 * rng.randn(c, f), jnp.float32)

        r_ref = jnp.maximum(x * a + b + sk, 0)
        y_ref = _reference(r_ref, dwk, pwk, False, 1)
        y, r = fused_sepconv_boundary(x, a, b, sk, dwk, pwk, 1, True)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("n,h,w,c,f", BCASES[:2])
    @pytest.mark.parametrize("stats", [False, True])
    def test_gradient_parity(self, n, h, w, c, f, stats):
        """All six cotangent paths (dx, da, db, dskip, ddw, dpw) vs XLA
        autodiff of the composition — including the r output's external
        cotangent (the skip-path consumer) and, for the stats variant,
        the (Σy, Σy²) cotangents."""
        from deepcam_tpu.ops.pallas.fused_sepconv import (
            fused_sepconv_boundary,
            fused_sepconv_boundary_stats,
        )

        rng = np.random.RandomState(hash((n, h, w, c, f)) % 2**31)
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
        a = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        b = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        sk = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
        dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.float32)
        pwk = jnp.asarray(0.2 * rng.randn(c, f), jnp.float32)
        gy = jnp.asarray(rng.randn(n, h, w, f), jnp.float32)
        gr = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)

        def loss_fused(x, a, b, sk, dwk, pwk):
            if stats:
                y, r, s1, s2 = fused_sepconv_boundary_stats(
                    x, a, b, sk, dwk, pwk, 1, True)
                # exercise the stats cotangents like a BN consumer would
                extra = jnp.sum(s1 * 0.3) + jnp.sum(s2 * 0.1)
            else:
                y, r = fused_sepconv_boundary(x, a, b, sk, dwk, pwk, 1, True)
                extra = 0.0
            return jnp.sum(y * gy) + jnp.sum(r * gr) + extra

        def loss_ref(x, a, b, sk, dwk, pwk):
            r = jnp.maximum(x * a + b + sk, 0)
            y = _reference(r, dwk, pwk, False, 1)
            extra = 0.0
            if stats:
                y32 = y.astype(jnp.float32)
                extra = (jnp.sum(jnp.sum(y32, axis=(0, 1, 2)) * 0.3)
                         + jnp.sum(jnp.sum(y32 * y32, axis=(0, 1, 2)) * 0.1))
            return jnp.sum(y * gy) + jnp.sum(r * gr) + extra

        g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
            x, a, b, sk, dwk, pwk)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
            x, a, b, sk, dwk, pwk)
        for name, got, want in zip(("dx", "da", "db", "dskip", "ddw", "dpw"),
                                   g_f, g_r):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4,
                err_msg=name)

    def test_xception_boundary_fold_matches_default(self, monkeypatch):
        """DEEPCAM_BOUNDARY_FOLD=1 (XLA fallback AND interpret kernels)
        reproduces the default middle-flow graph: identical param tree,
        matching eval/train outputs and grads at relative tolerance."""
        from deepcam_tpu.models import layers as L
        from deepcam_tpu.models.xception import Xception

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 32, 48, 16), jnp.float32)
        model = Xception(output_stride=16, dtype=jnp.float32)

        def run(fold, impl):
            if fold:
                monkeypatch.setenv("DEEPCAM_BOUNDARY_FOLD", "1")
            else:
                monkeypatch.delenv("DEEPCAM_BOUNDARY_FOLD", raising=False)
            L.set_sepconv_impl(impl)
            try:
                v = model.init(jax.random.PRNGKey(3), x, train=False)
                y_eval, _ = model.apply(v, x, train=False)

                def loss(p):
                    (y, _), _ = model.apply(
                        {"params": p, "batch_stats": v["batch_stats"]},
                        x, train=True, mutable=["batch_stats"])
                    return jnp.sum(y.astype(jnp.float32) ** 2) / 1e9

                val, g = jax.value_and_grad(loss)(v["params"])
                return v, np.asarray(y_eval), float(val), g
            finally:
                L.set_sepconv_impl("auto")
                monkeypatch.delenv("DEEPCAM_BOUNDARY_FOLD", raising=False)

        v0, y0, l0, g0 = run(False, "auto")
        v1, y1, l1, g1 = run(True, "auto")
        v2, y2, l2, g2 = run(True, "fused")
        jax.tree_util.tree_map(
            lambda p, q: np.testing.assert_array_equal(
                np.asarray(p), np.asarray(q)),
            v0["params"], v1["params"])
        jax.tree_util.tree_map(
            lambda p, q: np.testing.assert_array_equal(
                np.asarray(p), np.asarray(q)),
            v0["params"], v2["params"])
        scale = np.abs(y0).max()
        # XLA fallback is the identical graph (bit-exact); interpret
        # kernels differ by fp32 reduction order only
        np.testing.assert_array_equal(y0, y1)
        np.testing.assert_allclose(y2, y0, atol=2e-5 * scale)
        np.testing.assert_allclose(l1, l0, rtol=1e-6)
        np.testing.assert_allclose(l2, l0, rtol=1e-4)

        def gnorm_rel(ga, gb):
            flat_a = jnp.concatenate(
                [jnp.ravel(t) for t in jax.tree_util.tree_leaves(ga)])
            flat_b = jnp.concatenate(
                [jnp.ravel(t) for t in jax.tree_util.tree_leaves(gb)])
            return float(jnp.linalg.norm(flat_a - flat_b)
                         / (jnp.linalg.norm(flat_b) + 1e-30))

        assert gnorm_rel(g1, g0) < 1e-5
        # interpret-kernel bar: the PLAIN fused impl (no fold) measures
        # 3e-4..2e-3 against auto on identical params across processes
        # (fp32 reduction-order noise amplified by random-init BN scales);
        # fold-vs-plain-fused is ~8e-5, i.e. the fold adds nothing
        assert gnorm_rel(g2, g0) < 5e-3


class TestBwdTrafficKnobs:
    """DD16 (bf16 pointwise-dgrad for the tap loops — the unfused path's
    own precision) and EMIT_D (forward-emitted depthwise output replaces
    the backward's 9-tap recompute): gradient parity in both modes."""

    @pytest.mark.parametrize("env", [
        {"DEEPCAM_FUSED_DD16": "1"},
        {"DEEPCAM_FUSED_EMIT_D": "8"},
        {"DEEPCAM_FUSED_DD16": "1", "DEEPCAM_FUSED_EMIT_D": "8"},
    ])
    def test_gradient_parity(self, env, monkeypatch):
        from deepcam_tpu.ops.pallas.fused_sepconv import (
            fused_sepconv_affine_stats,
        )

        rng = np.random.RandomState(3)
        n, h, w, c, f = 2, 16, 12, 16, 24
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
        a = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        b = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
        dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.float32)
        pwk = jnp.asarray(0.2 * rng.randn(c, f), jnp.float32)
        gy = jnp.asarray(rng.randn(n, h, w, f), jnp.float32)

        def loss(x, a, b, dwk, pwk):
            y, s1, s2 = fused_sepconv_affine_stats(
                x, a, b, dwk, pwk, True, 1, True)
            return jnp.sum(y * gy) + jnp.sum(s1 * 0.3) + jnp.sum(s2 * 0.1)

        grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
        base = grad(x, a, b, dwk, pwk)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        got = grad(x, a, b, dwk, pwk)
        for name, p, q in zip(("dx", "da", "db", "ddw", "dpw"), got, base):
            np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                       rtol=1e-4, atol=1e-4, err_msg=name)
