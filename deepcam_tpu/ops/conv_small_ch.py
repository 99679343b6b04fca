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


def _use_pallas_wgrad() -> bool:
    import os

    if os.environ.get("DEEPCAM_PALLAS_CWGRAD") == "0":
        return False
    if os.environ.get("DEEPCAM_PALLAS_CWGRAD") == "1":
        pass  # forced on (still requires TPU below)
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
    co = kernel.shape[-1]
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

    # wgrad: single-residency Pallas kernel on TPU (all nine taps from one
    # window per grid step — the slice form re-reads x ~9x, ~13 ms/step of
    # slices in the fused-model trace); slice-form einsums elsewhere
    if _use_pallas_wgrad():
        from .pallas.conv_wgrad import conv3x3_wgrad_pallas

        dk = conv3x3_wgrad_pallas(x, g, stride=stride).astype(kernel.dtype)
        return dx.astype(x.dtype), dk

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    oh, ow = g.shape[1], g.shape[2]
    g32 = g.astype(jnp.float32)
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
                    tap.astype(jnp.float32),
                    g32,
                    preferred_element_type=jnp.float32,
                )
            )
        rows.append(jnp.stack(cols))
    dk = jnp.stack(rows).astype(kernel.dtype)  # (3,3,ci,co)
    return dx.astype(x.dtype), dk


conv3x3_small_ch.defvjp(_fwd, _bwd)
