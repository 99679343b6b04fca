"""Depthwise 3x3 convolution as shift-multiply-adds (VPU form).

A depthwise conv has channel-multiplier 1 — there is no contraction to feed
the MXU, so lowering it as a grouped ``conv_general_dilated`` wastes the
systolic array.  The natural TPU form is 9 shifted elementwise
multiply-accumulates over the (N, H, W, C) activation (lane dim = C), which
XLA fuses into a single VPU loop over the padded input.

Supports stride 1/2 and dilation (the only cases the model uses:
``SeparableConv2d_same``, deeplab_xception.py:54-66).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def depthwise3x3_shifts(
    x: jax.Array,
    kernel: jax.Array,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: Tuple[int, int] = (1, 1),
) -> jax.Array:
    """Depthwise 3x3 'same' conv.

    x: (N, H, W, C); kernel: (3, 3, 1, C) HWIO (flax grouped-conv layout) or
    (3, 3, C).  padding = (pad_beg, pad_end) applied to both spatial dims
    (the reference's fixed_padding semantics).
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
            tap = jax.lax.slice(
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
