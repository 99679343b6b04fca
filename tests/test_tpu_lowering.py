"""AOT TPU (Mosaic) lowering regression tests for every Pallas kernel path.

The CPU test suite runs the kernels in interpret mode, which NEVER exercises
the Mosaic lowering — round 3 found a kernel (since deleted) failing on real
hardware with "Only 2D gather is supported" (jnp strided ``[0::2]`` indexing
lowers to a >2-D gather; ``lax.slice`` strides to a stride-2
``vector.extract_strided_slice`` — Mosaic rejects both) while all its
interpret-mode parity tests passed.  ``jit(f).trace(x).lower(
lowering_platforms=("tpu",))`` runs the full Mosaic pipeline on a CPU-only
machine, so every kernel configuration that can reach hardware is lowered
here.  No TPU (or execution) involved — these are compile-only.
"""

import functools

import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def _lower(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def _grad_all(fn, n):
    def loss(*args):
        out = fn(*args)
        out = out[0] if isinstance(out, tuple) else out
        return out.astype(jnp.float32).sum()

    return jax.grad(loss, argnums=tuple(range(n)))


def _s1_operands(c=128, f=128, h=48, w=72):
    x = jnp.zeros((2, h, w, c), jnp.bfloat16)
    dwk = jnp.zeros((3, 3, c), jnp.bfloat16)
    pwk = jnp.zeros((c, f), jnp.bfloat16)
    a = jnp.zeros((1, c), jnp.bfloat16)
    b = jnp.zeros((1, c), jnp.bfloat16)
    return x, a, b, dwk, pwk


@pytest.mark.parametrize("roll", ["0", "1"])
@pytest.mark.parametrize("pre_relu", [True, False])
@pytest.mark.parametrize("dilation", [1, 2])
def test_fused_sepconv_s1_lowers(pre_relu, dilation, roll, monkeypatch):
    # roll=1 (default): tap shifts as fp32 pltpu.roll sublane rotates;
    # roll=0: the zero-block-concat fallback (debug/opt-out arm)
    monkeypatch.setenv("DEEPCAM_FUSED_ROLL", roll)
    from deepcam_tpu.ops.pallas.fused_sepconv import fused_sepconv

    x, _, _, dwk, pwk = _s1_operands()
    fn = functools.partial(fused_sepconv, pre_relu=pre_relu, dilation=dilation)
    _lower(fn, x, dwk, pwk)
    _lower(_grad_all(fn, 3), x, dwk, pwk)


@pytest.mark.parametrize("csplit", ["2", "4"])
def test_fused_sepconv_csplit_lowers(csplit, monkeypatch):
    # DEEPCAM_FUSED_CSPLIT=N: chunk-major backward tap loops (round-5
    # c-minor split); entry-shape gate lowered so the s1 shape qualifies
    monkeypatch.setenv("DEEPCAM_FUSED_CSPLIT", csplit)
    monkeypatch.setenv("DEEPCAM_FUSED_CSPLIT_MINH", "8")
    from deepcam_tpu.ops.pallas.fused_sepconv import fused_sepconv

    x, _, _, dwk, pwk = _s1_operands()
    fn = functools.partial(fused_sepconv, pre_relu=True, dilation=1)
    _lower(_grad_all(fn, 3), x, dwk, pwk)


@pytest.mark.parametrize("nopad", ["0", "1"])
def test_fused_sepconv_s1_stats_affine_lowers(nopad, monkeypatch):
    monkeypatch.setenv("DEEPCAM_FUSED_NOPAD", nopad)
    from deepcam_tpu.ops.pallas.fused_sepconv import (
        fused_sepconv_affine,
        fused_sepconv_affine_stats,
        fused_sepconv_stats,
    )

    x, a, b, dwk, pwk = _s1_operands()
    _lower(_grad_all(fused_sepconv_stats, 3), x, dwk, pwk)
    _lower(_grad_all(fused_sepconv_affine, 5), x, a, b, dwk, pwk)
    _lower(_grad_all(fused_sepconv_affine_stats, 5), x, a, b, dwk, pwk)


def test_fused_sepconv_s1_stats_inkernel_lowers(monkeypatch):
    monkeypatch.setenv("DEEPCAM_STATS_INKERNEL", "1")
    monkeypatch.setenv("DEEPCAM_FUSED_NOPAD", "1")
    from deepcam_tpu.ops.pallas.fused_sepconv import fused_sepconv_stats

    x, _, _, dwk, pwk = _s1_operands()
    _lower(_grad_all(fused_sepconv_stats, 3), x, dwk, pwk)


def test_fused_sepconv_boundary_lowers():
    """Block-boundary variant (r = relu(x*a + b + skip) in-kernel) — both
    forms, full grad, including the r-output cotangent path."""
    from deepcam_tpu.ops.pallas.fused_sepconv import (
        fused_sepconv_boundary,
        fused_sepconv_boundary_stats,
    )

    x, a, b, dwk, pwk = _s1_operands()
    sk = jnp.zeros_like(x)

    def loss_b(x, a, b, sk, dwk, pwk):
        y, r = fused_sepconv_boundary(x, a, b, sk, dwk, pwk)
        return (y.astype(jnp.float32).sum()
                + r.astype(jnp.float32).sum())

    def loss_bs(x, a, b, sk, dwk, pwk):
        y, r, s1, s2 = fused_sepconv_boundary_stats(x, a, b, sk, dwk, pwk)
        return (y.astype(jnp.float32).sum()
                + r.astype(jnp.float32).sum() + s1.sum() + s2.sum())

    _lower(jax.grad(loss_b, argnums=(0, 1, 2, 3, 4, 5)),
           x, a, b, sk, dwk, pwk)
    _lower(jax.grad(loss_bs, argnums=(0, 1, 2, 3, 4, 5)),
           x, a, b, sk, dwk, pwk)


def test_fused_sepconv_boundary_lowers_at_middle_shape():
    """The shape the fold actually runs at: middle flow (48, 72, 728),
    batch 4."""
    from deepcam_tpu.ops.pallas.fused_sepconv import fused_sepconv_boundary

    x = jnp.zeros((4, 48, 72, 728), jnp.bfloat16)
    a = jnp.zeros((728,), jnp.bfloat16)
    b = jnp.zeros((728,), jnp.bfloat16)
    sk = jnp.zeros_like(x)
    dwk = jnp.zeros((3, 3, 728), jnp.bfloat16)
    pwk = jnp.zeros((728, 728), jnp.bfloat16)

    def loss(x, a, b, sk, dwk, pwk):
        y, r = fused_sepconv_boundary(x, a, b, sk, dwk, pwk)
        return y.astype(jnp.float32).sum() + r.astype(jnp.float32).sum()

    _lower(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)),
           x, a, b, sk, dwk, pwk)


def test_full_train_step_lowers_for_tpu():
    """The whole jitted train step (default knobs) must pass the Mosaic +
    XLA lowering pipeline — catches kernel-lowering regressions in the
    exact composition hardware runs."""
    from deepcam_tpu.core import mesh as meshlib
    from deepcam_tpu.models.deeplab import DeepLabv3plus
    from deepcam_tpu.train.losses import class_weights
    from deepcam_tpu.train.optim import build_optimizer
    from deepcam_tpu.train.trainer import create_train_state, make_train_step
    from deepcam_tpu.models import layers as layerlib

    layerlib.set_sepconv_impl("fused")  # force the Pallas path into the HLO
    try:
        model = DeepLabv3plus(n_classes=3, dtype=jnp.bfloat16)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 16), jnp.float32),
            train=False)
        tx = build_optimizer("AdamW", 1e-3)
        mesh = meshlib.make_mesh(devices=jax.devices()[:1])
        state = create_train_state(model, variables, tx)
        step = make_train_step(model, tx, list(class_weights()), mesh,
                               with_iou=False)
        x = jnp.zeros((2, 64, 96, 16), jnp.bfloat16)
        y = jnp.zeros((2, 64, 96), jnp.int32)
        step.trace(state, x, y).lower(lowering_platforms=("tpu",))
    finally:
        layerlib.set_sepconv_impl("auto")
