"""Bilinear interpolation with ``align_corners=True`` semantics, TPU-style.

The reference uses ``F.interpolate(..., mode='bilinear', align_corners=True)``
(``/root/reference/src/deepCam/architecture/deeplab_xception.py:329-333,450``).
``jax.image.resize`` uses half-pixel centers, which does NOT match, so we build
the align-corners sampling explicitly.

TPU-first design: instead of gather-based sampling (VPU-bound, poor layout),
1-D interpolation along H and W is expressed as two small dense matmuls with
precomputed interpolation matrices — these run on the MXU and the weight
matrices are compile-time constants folded by XLA.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) align-corners bilinear interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    if out_size == 1:
        # align_corners with a single output sample reads the first input pixel
        # (coordinate 0), matching torch.
        m[0, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    for o in range(out_size):
        src = o * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        m[o, lo] += 1.0 - frac
        m[o, hi] += frac
    return m


def resize_bilinear_align_corners(x: jnp.ndarray, size) -> jnp.ndarray:
    """Resize NHWC ``x`` to spatial ``size=(H, W)`` with align_corners=True.

    Implemented as einsum with constant interpolation matrices (MXU-friendly);
    interpolation arithmetic is done in fp32 and cast back to the input dtype.
    """
    out_h, out_w = size
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    if h == 1 and w == 1:
        # Common fast path: the ASPP global-pool branch broadcasts a 1x1 map.
        return jnp.broadcast_to(x32, (n, out_h, out_w, c)).astype(dtype)
    mh = jnp.asarray(_interp_matrix(h, out_h))
    mw = jnp.asarray(_interp_matrix(w, out_w))
    y = jnp.einsum("oh,nhwc->nowc", mh, x32)
    y = jnp.einsum("pw,nowc->nopc", mw, y)
    return y.astype(dtype)
