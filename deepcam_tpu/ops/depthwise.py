"""Depthwise 3x3 convolution: TPU-tuned lowerings and a custom VJP.

Forward: the grouped ``conv_general_dilated`` lowering is fine on XLA:TPU
(measured), and a 9-tap shift-multiply VPU form is provided for study.

Backward: XLA's autodiff of grouped convs generates pathological gradients at
high resolution (measured ~4.4x fwd cost for the entry flow; see PERF.md), so
``depthwise3x3`` is a ``custom_vjp`` with hand-built gradients:

* **dgrad** — a depthwise conv of the cotangent with the spatially flipped
  kernel (input-dilated for stride 2): same op class as the forward, which
  XLA lowers well;
* **wgrad** — nine shifted elementwise multiply-reduce contractions in fp32
  (one per tap), pure VPU + reduction work.

Supports stride 1 (any dilation, symmetric 'same' padding) and stride 2
(dilation 1, padding (1,1)) — exactly the cases the model uses
(``SeparableConv2d_same``, deeplab_xception.py:54-66).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


import os


# NOTE (r3): the standalone Pallas dw-wgrad kernel (DEEPCAM_PALLAS=1,
# ops/pallas/dw_wgrad.py) was PRUNED — it beat the slice form at every
# standalone shape but lost ~7% whole-model (custom-call fusion boundary),
# and the fused sepconv kernel's one-kernel VJP superseded its use case
# entirely.  See git history and PERF.md for the measurements.


def _grouped_conv(x, k4, stride, dilation, pad, lhs_dilation=(1, 1)):
    return lax.conv_general_dilated(
        x,
        k4,
        window_strides=(stride, stride),
        padding=(pad, pad),
        rhs_dilation=(dilation, dilation),
        lhs_dilation=lhs_dilation,
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def depthwise3x3(
    x: jax.Array,
    kernel: jax.Array,
    stride: int = 1,
    dilation: int = 1,
    padding: Tuple[int, int] = (1, 1),
) -> jax.Array:
    """Depthwise 3x3 conv, grouped-conv forward + custom backward.

    x: (N, H, W, C); kernel: (3, 3, 1, C) HWIO.
    """
    return _grouped_conv(x, kernel, stride, dilation, padding)


def _dw_fwd(x, kernel, stride, dilation, padding):
    return depthwise3x3(x, kernel, stride, dilation, padding), (x, kernel)


def _dw_bwd(stride, dilation, padding, res, g):
    x, kernel = res
    n, h, w, c = x.shape
    pb, pe = padding
    kf = jnp.flip(kernel, axis=(0, 1))

    if stride == 1:
        # out spatial == in spatial for the model's 'same' cases; transpose
        # padding of (pb, pe) under k_eff = 2*dilation + 1 is
        # (k_eff-1-pb, k_eff-1-pe)
        keff = 2 * dilation + 1
        dpad = (keff - 1 - pb, keff - 1 - pe)
        dx = _grouped_conv(g, kf, 1, dilation, dpad)
    elif stride == 2 and dilation == 1 and padding == (1, 1):
        # transposed stride-2 conv: input-dilate the cotangent; padding
        # (k-1-pb, k-1-pe + extra) chosen so the output size is exactly H
        # (dilated size 2*o-1) + padL + padR - 3 + 1 = in_size with padL = 1
        oh, ow = g.shape[1], g.shape[2]
        pad_l = 3 - 1 - pb  # = 1
        pad_r_h = h - (2 * oh - 1) - pad_l + 2
        pad_r_w = w - (2 * ow - 1) - pad_l + 2
        dx = lax.conv_general_dilated(
            g, kf, (1, 1),
            padding=((pad_l, pad_r_h), (pad_l, pad_r_w)),
            lhs_dilation=(2, 2),
            feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        raise NotImplementedError(
            f"depthwise3x3 bwd: stride={stride} dilation={dilation} "
            f"padding={padding}"
        )

    # wgrad: dk[i, j, c] = sum_{n, ho, wo} xp[n, ho*s + i*d, wo*s + j*d, c]
    #                      * g[n, ho, wo, c]
    g32 = g.astype(jnp.float32)
    oh, ow = g.shape[1], g.shape[2]

    if (
        stride == 2 and dilation == 1 and padding == (1, 1)
        and h % 2 == 0 and w % 2 == 0
        and os.environ.get("DEEPCAM_DW_WGRAD_S2D", "1") == "1"
    ):
        # s2d-phase form: each tap (ky, kx) reads exactly ONE phase of
        # s2d(x) at a 0/-1 block shift, so nine LANE-ALIGNED slices of the
        # once-padded s2d(x) replace nine STRIDED full-res slices (which
        # cost ~0.64 ms each at (4, 384, 576, 128) — r2 trace, block1).
        from .conv_small_ch import _S2D_SEL, _s2d

        xs = _s2d(x)  # (N, H/2, W/2, (ph, pw, C))
        xsp = jnp.pad(xs, ((0, 0), (1, 0), (1, 0), (0, 0)))
        rows = []
        for ky in range(3):
            bh, ph = _S2D_SEL[ky]
            cols = []
            for kx in range(3):
                bw, pw = _S2D_SEL[kx]
                off = (ph * 2 + pw) * c
                tap = lax.slice(
                    xsp, (0, bh, bw, off), (n, bh + oh, bw + ow, off + c))
                cols.append(jnp.sum(
                    tap.astype(jnp.float32) * g32, axis=(0, 1, 2)))
            rows.append(jnp.stack(cols))
        dk = jnp.stack(rows)  # (3, 3, C)
        dk = dk[:, :, None, :].astype(kernel.dtype)
        return dx.astype(x.dtype), dk

    xp = jnp.pad(x, ((0, 0), (pb, pe), (pb, pe), (0, 0)))
    taps = []
    for i in range(3):
        row = []
        for j in range(3):
            tap = lax.slice(
                xp,
                (0, i * dilation, j * dilation, 0),
                (
                    n,
                    i * dilation + (oh - 1) * stride + 1,
                    j * dilation + (ow - 1) * stride + 1,
                    c,
                ),
                (1, stride, stride, 1),
            )
            row.append(jnp.sum(tap.astype(jnp.float32) * g32, axis=(0, 1, 2)))
        taps.append(row)
    dk = jnp.stack([jnp.stack(r) for r in taps])  # (3, 3, C)
    dk = dk[:, :, None, :].astype(kernel.dtype)   # (3, 3, 1, C)
    return dx.astype(x.dtype), dk


depthwise3x3.defvjp(_dw_fwd, _dw_bwd)


def depthwise3x3_shifts(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: Tuple[int, int] = (1, 1),
) -> jax.Array:
    """Shift-multiply (VPU) lowering of the same op.

    x: (N, H, W, C); kernel: (3, 3, 1, C) HWIO or (3, 3, C).
    padding = (pad_beg, pad_end) applied to both spatial dims (the
    reference's fixed_padding semantics).
    """
    if kernel.ndim == 4:
        kernel = kernel[:, :, 0, :]
    n, h, w, c = x.shape
    pb, pe = padding
    xp = jnp.pad(x, ((0, 0), (pb, pe), (pb, pe), (0, 0)))
    out_h = (h + pb + pe - (2 * dilation + 1)) // stride + 1
    out_w = (w + pb + pe - (2 * dilation + 1)) // stride + 1

    # accumulate in fp32 (register-level upcast, fused by XLA) to match the
    # MXU conv path's fp32 accumulation
    acc = None
    k32 = kernel.astype(jnp.float32)
    for i in range(3):
        for j in range(3):
            tap = lax.slice(
                xp,
                (0, i * dilation, j * dilation, 0),
                (
                    n,
                    i * dilation + (out_h - 1) * stride + 1,
                    j * dilation + (out_w - 1) * stride + 1,
                    c,
                ),
                (1, stride, stride, 1),
            )
            term = tap.astype(jnp.float32) * k32[i, j]
            acc = term if acc is None else acc + term
    return acc.astype(x.dtype)
