"""Custom VJP for small-channel 3x3 convs (the Xception entry convs).

The wgrad of a conv whose channel counts are far below the 128-lane width
(conv1: 16→32 at 768x1152, conv2: 32→64 at 384x576) forces XLA into
layout-hostile re-tilings — the single largest copy in the step profile was
conv1's wgrad input shuffle (175 MB per step; PERF.md).  This custom VJP
keeps the forward as-is and computes:

* dgrad — a transposed conv expressed directly (input-dilated for stride 2),
  the same op class XLA lowers well;
* wgrad — nine strided-slice × cotangent einsum contractions
  (``(P, Cin) x (P, Cout) -> (Cin, Cout)`` per tap) that run on the MXU with
  fp32 accumulation and no exotic layouts.

Supports kernel 3x3, stride 1/2, symmetric padding (1, 1) — exactly the
entry-conv cases (deeplab_xception.py:145-149).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


# NOTE (r3): the Pallas single-residency entry-conv wgrad kernel
# (DEEPCAM_PALLAS_CWGRAD=1, ops/pallas/conv_wgrad.py) was PRUNED — correct
# but 0.84-0.99x whole-model (custom-call fusion boundary), and the s2d
# conv1 default removed the strided-slice pathology it targeted.  See git
# history and PERF.md.


def _use_s2d() -> bool:
    # Space-to-depth formulation of the stride-2 entry conv (conv1).  On by
    # default on TPU (A/B: scripts/s2d_ab.py); DEEPCAM_S2D=0 opts out.
    import os

    if os.environ.get("DEEPCAM_S2D") == "0":
        return False
    if os.environ.get("DEEPCAM_S2D") == "1":
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _conv(x, k, stride):
    return lax.conv_general_dilated(
        x, k, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_small_ch(x: jax.Array, kernel: jax.Array, stride: int = 1):
    """3x3 conv, padding (1,1), NHWC/HWIO, custom backward."""
    return _conv(x, kernel, stride)


def _fwd(x, kernel, stride):
    return conv3x3_small_ch(x, kernel, stride), (x, kernel)


def _bwd(stride, res, g):
    x, kernel = res
    n, h, w, ci = x.shape
    # dgrad: transposed conv — spatially flipped kernel with in/out swapped
    kt = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)  # (3,3,co,ci)
    if stride == 1:
        dx = lax.conv_general_dilated(
            g, kt, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:  # stride 2, padding (1,1)
        oh, ow = g.shape[1], g.shape[2]
        pad_r_h = h - (2 * oh - 1) - 1 + 2
        pad_r_w = w - (2 * ow - 1) - 1 + 2
        dx = lax.conv_general_dilated(
            g, kt, (1, 1),
            padding=((1, pad_r_h), (1, pad_r_w)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # wgrad: slice-form tap einsums (the pruned Pallas single-residency
    # kernel lost whole-model — see the r3 NOTE above)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    oh, ow = g.shape[1], g.shape[2]
    # bf16 operands: products of bf16 inputs are exact in the MXU fp32
    # accumulator (preferred_element_type); an explicit fp32 upcast only
    # materializes fp32 copies of the operands (r2 trace, see ops/deconv.py)
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            tap = lax.slice(
                xp,
                (0, i, j, 0),
                (n, i + (oh - 1) * stride + 1, j + (ow - 1) * stride + 1, ci),
                (1, stride, stride, 1),
            )
            cols.append(
                jnp.einsum(
                    "nhwc,nhwd->cd",
                    tap,
                    g,
                    preferred_element_type=jnp.float32,
                )
            )
        rows.append(jnp.stack(cols))
    dk = jnp.stack(rows).astype(kernel.dtype)  # (3,3,ci,co)
    return dx.astype(x.dtype), dk


conv3x3_small_ch.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Space-to-depth formulation of the stride-2 entry conv (conv1).
#
# A 3x3/stride-2/pad-1 conv over (N, H, W, C) is exactly a 2x2/stride-1 conv
# over the space-to-depth input (N, H/2, W/2, 4C) with a rearranged kernel:
# block tap (bh, bw), s2d channel (ph, pw, c) ← original tap
# (2bh+ph-1, 2bw+pw-1) — the (bh=0, ph=0) phases fall on tap index -1 and
# are zero.  Why: the strided form is layout-hostile on TPU twice over — the
# forward tiles a 16-lane conv at 768x1152, and the slice-form wgrad takes
# nine STRIDED slices of that input (~13 ms/step of slice ops in the fused
# trace, PERF.md).  In block space the conv contracts 64 lanes at half
# resolution and the wgrad's four taps are contiguous slices.  The extra
# multiplies against the zero phases are ~0.8x the conv's own FLOPs — noise
# against the layout win.  conv1 is the first layer, so its dgrad is dead
# code in the training step (DCE'd); it is still implemented (inverse-s2d of
# the block-space transposed conv) and tested.
# ---------------------------------------------------------------------------


def _s2d(x):
    """(N, H, W, C) → (N, H/2, W/2, 4C); channel index = (ph, pw, c)."""
    n, h, w, c = x.shape
    return (
        x.reshape(n, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h // 2, w // 2, 4 * c)
    )


def _s2d_inv(xs, c):
    """Inverse of `_s2d`."""
    n, h2, w2, _ = xs.shape
    return (
        xs.reshape(n, h2, w2, 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, 2 * h2, 2 * w2, c)
    )


# (ky | kx) → (block tap, phase): ky = 2*bh + ph - 1
_S2D_SEL = {0: (0, 1), 1: (1, 0), 2: (1, 1)}


def _s2d_kernel(kernel):
    """(3, 3, C, F) → (2, 2, 4C, F) block-space kernel."""
    c, f = kernel.shape[2], kernel.shape[3]
    zero = jnp.zeros_like(kernel[0, 0])

    def tap(ky, kx):
        return kernel[ky, kx] if (ky >= 0 and kx >= 0) else zero

    k2 = jnp.stack([
        jnp.stack([
            jnp.stack([
                jnp.stack([tap(2 * bh + ph - 1, 2 * bw + pw - 1)
                           for pw in range(2)])
                for ph in range(2)
            ])
            for bw in range(2)
        ])
        for bh in range(2)
    ])  # (bh, bw, ph, pw, C, F)
    return k2.reshape(2, 2, 4 * c, f)


def _s2d_conv(xs, k2):
    return lax.conv_general_dilated(
        xs, k2, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def conv3x3s2_s2d(x: jax.Array, kernel: jax.Array):
    """3x3 conv, stride 2, padding (1,1), NHWC/HWIO — space-to-depth form.

    Same math as ``conv3x3_small_ch(x, kernel, 2)``; H and W must be even.
    """
    return _s2d_conv(_s2d(x), _s2d_kernel(kernel))


def _s2d_fwd(x, kernel):
    xs = _s2d(x)
    return _s2d_conv(xs, _s2d_kernel(kernel)), (xs, kernel)


def _s2d_bwd_core(xs, kernel, g):
    """Shared backward: (dxs in BLOCK space, dk (3,3,C,F) fp32)."""
    n, oh, ow, c4 = xs.shape
    c = c4 // 4
    co = kernel.shape[-1]

    # dgrad in block space (dead in the model — conv1 is the first layer —
    # but correct): y[o] = Σ_b xs[o-1+b]·k2[b] ⇒ dxs[i] = Σ_b g[i+b]·k2ᵀ[1-b]
    k2 = _s2d_kernel(kernel)
    kt = jnp.flip(k2, axis=(0, 1)).transpose(0, 1, 3, 2)  # (2,2,co,4c)
    dxs = lax.conv_general_dilated(
        g, kt, (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    # wgrad: four CONTIGUOUS taps of the block-padded input on the MXU
    xp = jnp.pad(xs, ((0, 0), (1, 0), (1, 0), (0, 0)))
    # bf16 operands, fp32 MXU accumulation (exact for bf16 inputs)
    taps = []
    for bh in range(2):
        for bw in range(2):
            tap = lax.slice(xp, (0, bh, bw, 0), (n, bh + oh, bw + ow, c4))
            taps.append(jnp.einsum(
                "nhwc,nhwd->cd", tap, g,
                preferred_element_type=jnp.float32,
            ))
    dk2 = jnp.stack(taps).reshape(2, 2, 2, 2, c, co)  # (bh, bw, ph, pw, c, co)
    dk = jnp.stack([
        jnp.stack([
            dk2[_S2D_SEL[ky][0], _S2D_SEL[kx][0],
                _S2D_SEL[ky][1], _S2D_SEL[kx][1]]
            for kx in range(3)
        ])
        for ky in range(3)
    ])  # (3, 3, c, co)
    return dxs, dk


def _s2d_bwd(res, g):
    xs, kernel = res
    dxs, dk = _s2d_bwd_core(xs, kernel, g)
    dx = _s2d_inv(dxs, xs.shape[-1] // 4)
    return dx.astype(xs.dtype), dk.astype(kernel.dtype)


conv3x3s2_s2d.defvjp(_s2d_fwd, _s2d_bwd)


@jax.custom_vjp
def conv3x3s2_s2d_pre(xs: jax.Array, kernel: jax.Array):
    """``conv3x3s2_s2d`` on a PRE-space-to-depth'd input xs
    (N, H/2, W/2, 4C) — the host input pipeline can emit this layout
    directly, removing the on-device s2d transpose of the full-res input
    (~1.9 ms/step at (4,768,1152,16): r4 trace copy.2478, the single
    largest formatting op).  ``kernel`` stays the logical (3, 3, C, F);
    the xs cotangent comes back in block space (dead for conv1, the
    model's first layer)."""
    return _s2d_conv(xs, _s2d_kernel(kernel))


def _s2dp_fwd(xs, kernel):
    return _s2d_conv(xs, _s2d_kernel(kernel)), (xs, kernel)


def _s2dp_bwd(res, g):
    xs, kernel = res
    dxs, dk = _s2d_bwd_core(xs, kernel, g)
    return dxs.astype(xs.dtype), dk.astype(kernel.dtype)


conv3x3s2_s2d_pre.defvjp(_s2dp_fwd, _s2dp_bwd)


def s2d_input_active() -> bool:
    """Pre-space-to-depth INPUT feed (host emits conv1's s2d layout;
    `conv3x3s2_s2d_pre` consumes it).  Tri-state DEEPCAM_S2D_INPUT:
    0 = off, 1 = on, unset = on exactly where the s2d conv is already
    the default lowering (TPU — r4 A/B: 25.23 vs 24.73 samples/s/chip;
    CPU tests keep the direct-conv numerics they were written against)."""
    import os

    v = os.environ.get("DEEPCAM_S2D_INPUT")
    if v == "0":
        return False
    if v == "1":
        return True
    return _use_s2d()


def s2d_host(x):
    """The s2d rearrange as plain numpy — for host-side input pipelines
    (and bench feeds) that pre-format batches into the layout
    ``conv3x3s2_s2d_pre`` consumes.  Matches ``_s2d`` exactly.
    Accepts (N, H, W, C) or a single (H, W, C) sample."""
    import numpy as np

    if x.ndim == 3:
        return s2d_host(x[None])[0]
    n, h, w, c = x.shape
    return np.ascontiguousarray(
        x.reshape(n, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h // 2, w // 2, 4 * c))


def s2d_inv_host(xs, c: int = 16):
    """Numpy inverse of ``s2d_host`` (for visualization of s2d-fed
    batches)."""
    import numpy as np

    if xs.ndim == 3:
        return s2d_inv_host(xs[None], c)[0]
    n, h2, w2, _ = xs.shape
    return np.ascontiguousarray(
        xs.reshape(n, h2, w2, 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, 2 * h2, 2 * w2, c))


# ---------------------------------------------------------------------------
# 1x1 stride-2 conv (the XceptionBlock skip projections,
# deeplab_xception.py:79,111-118 — 3 sites: 64→128, 128→256, 256→728).
# XLA's autodiff wgrad gathers x[:, ::2, ::2] with a strided slice + layout
# copy (~0.9 ms at block1 shapes, r2 trace); the phase form reads one
# LANE-ALIGNED slice of s2d(x) instead, and dx scatters g@K^T to the even
# positions as a channel-pad + inverse-s2d (contiguous writes).
# ---------------------------------------------------------------------------


@jax.custom_vjp
def conv1x1s2(x: jax.Array, kernel: jax.Array):
    """1x1 conv, stride 2, no padding, NHWC/HWIO; H and W must be even.

    ``kernel`` is (1, 1, C, F); output is (N, H/2, W/2, F).
    """
    return lax.conv_general_dilated(
        x, kernel, (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _c1s2_fwd(x, kernel):
    return conv1x1s2(x, kernel), (x, kernel)


def _c1s2_bwd(res, g):
    x, kernel = res
    n, h, w, c = x.shape
    f = kernel.shape[-1]
    k = kernel.reshape(c, f)
    g = g.astype(x.dtype)

    # dx: g @ K^T scattered to the even positions — phase (0, 0) of the
    # s2d layout, so channel-pad to 4C and inverse-s2d (one reshape chain).
    dxs = jnp.einsum("nhwf,cf->nhwc", g, k.astype(x.dtype))
    dxs = jnp.pad(dxs, ((0, 0), (0, 0), (0, 0), (0, 3 * c)))
    dx = _s2d_inv(dxs, c)

    # dk: einsum against phase (0, 0) of s2d(x) — one lane-aligned slice.
    xs = _s2d(x)
    x00 = lax.slice(xs, (0, 0, 0, 0), (n, h // 2, w // 2, c))
    dk = jnp.einsum(
        "nhwc,nhwf->cf", x00, g,
        preferred_element_type=jnp.float32,
    )
    return dx.astype(x.dtype), dk.reshape(1, 1, c, f).astype(kernel.dtype)


conv1x1s2.defvjp(_c1s2_fwd, _c1s2_bwd)
