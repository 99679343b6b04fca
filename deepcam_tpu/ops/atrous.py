"""Shift-decomposed atrous (dilated) 3x3 conv for the ASPP branches.

The reference ASPP applies 3x3 convs with dilation/padding 6, 12 and 18 at
2048→256 channels on the (48, 72) os-16 grid (``deeplab_xception.py:282-312``
with rates ``[1, 6, 12, 18]``).  XLA lowers ``rhs_dilation`` convs at this
tiny spatial extent poorly — measured 22.6 TF/s on v5e (PERF.md r2
perf_breakdown), ~8x off peak, for ~130 GFLOP per branch per step.

A dilation-r 3x3 'same' conv is just nine r-shifted 1x1 contractions:

    y[h, w] = Σ_{i,j∈{0,1,2}} xp[h + r·i, w + r·j] @ K[i, j]

with ``xp`` the r-padded input.  Each tap is an MXU-dense
(N·H·W, C) @ (C, F) matmul over a contiguous slice — no dilation anywhere.
The custom VJP reuses the same structure:

    dx      = Σ taps of padded g with the flipped, I/O-transposed kernel
              (the adjoint of a stride-1 'same' conv is the same conv with
              rot180(K) and I/O swapped)
    dK[i,j] = einsum(x_tap(i,j), g)   (fp32 products/accumulation)

Gated by ``DEEPCAM_ATROUS`` (default OFF — the whole-model A/B measured
0.978x, see PERF.md; ``=1`` selects the nine-tap form, ``=s2b`` the
space-to-batch form); ``Conv2d`` routes stride-1 3x3 convs with
padding == dilation > 1 here when the gate is set.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _taps_fwd(x: jax.Array, kernel: jax.Array, rate: int) -> jax.Array:
    """Σ of nine r-shifted 1x1 contractions, fp32 accumulation, input-dtype
    output (bit-compatible with XLA's fp32-accumulating conv)."""
    n, h, w, c = x.shape
    f = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (rate, rate), (rate, rate), (0, 0)))
    acc = None
    for i in range(3):
        for j in range(3):
            tap = lax.slice(
                xp, (0, rate * i, rate * j, 0),
                (n, rate * i + h, rate * j + w, c))
            part = jnp.einsum(
                "nhwc,cf->nhwf", tap, kernel[i, j],
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_atrous(x: jax.Array, kernel: jax.Array, rate: int) -> jax.Array:
    """3x3 conv, stride 1, dilation = padding = ``rate``, NHWC/HWIO."""
    return _taps_fwd(x, kernel, rate)


def _fwd(x, kernel, rate):
    return _taps_fwd(x, kernel, rate), (x, kernel)


def _bwd(rate, res, g):
    x, kernel = res
    n, h, w, c = x.shape
    f = kernel.shape[-1]
    g = g.astype(x.dtype)

    # dgrad: same nine-tap structure with rot180(K), I/O swapped
    kt = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _taps_fwd(g, kt, rate)

    # wgrad: per-tap fp32 einsum over the shared padded input
    xp = jnp.pad(x, ((0, 0), (rate, rate), (rate, rate), (0, 0)))
    g32 = g.astype(jnp.float32)
    taps = []
    for i in range(3):
        for j in range(3):
            tap = lax.slice(
                xp, (0, rate * i, rate * j, 0),
                (n, rate * i + h, rate * j + w, c))
            taps.append(jnp.einsum(
                "nhwc,nhwf->cf", tap.astype(jnp.float32), g32,
                preferred_element_type=jnp.float32))
    dk = jnp.stack(taps).reshape(3, 3, c, f)
    return dx, dk.astype(kernel.dtype)


conv3x3_atrous.defvjp(_fwd, _bwd)


def conv3x3_atrous_s2b(x: jax.Array, kernel: jax.Array, rate: int) -> jax.Array:
    """Space-to-batch form of the dilation-``rate`` 3x3 'same' conv.

    ``y = b2s(conv3x3_same(s2b(x)))``: position ``u = rate·ub + p`` of the
    dilated conv taps ``x[u + rate·i] = (phase p, block ub+i)`` — i.e. each
    of the ``rate²`` phase grids is independently convolved by a *dense*
    stride-1 3x3 SAME conv over its block coordinates.  One conv with full
    windowed input reuse replaces the rhs_dilation schedule (measured ~8x
    off peak at (48, 72)) and the nine-tap shift form (which re-reads the
    2048-lane input 9x).  H/W not divisible by ``rate`` are zero-padded on
    the high side (zeros match the dilated conv's out-of-range taps) and
    the output is cropped.  Backward is XLA autodiff: the adjoint of a
    dense SAME conv is another dense SAME conv, and the s2b/b2s reshapes
    transpose to themselves.

    Parity target: the ASPP branches at ``deeplab_xception.py:282-312``
    (rates 6/12/18).
    """
    n, h, w, c = x.shape
    f = kernel.shape[-1]
    r = rate
    ph, pw = (-h) % r, (-w) % r
    xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hh, ww = h + ph, w + pw
    hb, wb = hh // r, ww // r
    # phase-major batch: (r·r·n, hb, wb, c) — phases vary fastest over the
    # leading axis so the inverse is the mirrored transpose
    z = xp.reshape(n, hb, r, wb, r, c)
    z = z.transpose(2, 4, 0, 1, 3, 5).reshape(r * r * n, hb, wb, c)
    y = lax.conv_general_dilated(
        z, kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y.reshape(r, r, n, hb, wb, f).transpose(2, 3, 0, 4, 1, 5)
    y = y.reshape(n, hh, ww, f)
    return y[:, :h, :w, :] if (ph or pw) else y
