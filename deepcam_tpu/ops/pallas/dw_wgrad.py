"""Pallas TPU kernel: depthwise-3x3 weight gradient in a single pass.

The custom-VJP wgrad in ops/depthwise.py computes nine shifted
slice-multiply-reduce taps; XLA materializes the strided slices, so each
depthwise layer's backward re-reads its activation ~9x (13.7 ms/step of
slice ops in the full-model trace — PERF.md).  This kernel computes all nine
taps in ONE pass: per grid step it DMAs a haloed activation tile into VMEM,
reads the matching cotangent tile, and accumulates the 9 per-channel
reductions into a (3, 3, C) fp32 output that is revisited across the batch
and row-tile grid dimensions (sequential TPU grid → safe accumulation).

Grid: (C_tiles, N, H_tiles) — the output block index depends only on the
slowest dimension, so each (3, 3, TC) accumulator stays resident in VMEM
while all (n, h) tiles stream through.

Supports stride 1 (any dilation d, symmetric pad (d, d)) and stride 2
(dilation 1, pad (1, 1)) — the model's only cases.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_row_tile(out_h: int) -> int:
    # small row tiles keep the per-tap VMEM temporaries well under the
    # scoped-vmem limit (59 MB stack OOM at th=32 on 576-wide tiles)
    for t in (8, 4, 2, 1):
        if out_h % t == 0:
            return t
    return 1


@functools.partial(
    jax.jit, static_argnames=("stride", "dilation", "padding", "interpret")
)
def dw_wgrad_pallas(
    x: jax.Array,
    g: jax.Array,
    *,
    stride: int = 1,
    dilation: int = 1,
    padding: Tuple[int, int] = (1, 1),
    interpret: bool = False,
) -> jax.Array:
    """dk[i,j,c] = sum_{n,ho,wo} xp[n, ho*s+i*d, wo*s+j*d, c] * g[n,ho,wo,c].

    x: (N, H, W, C); g: (N, OH, OW, C).  Returns (3, 3, C) fp32.
    """
    n, h, w, c = x.shape
    _, oh, ow, _ = g.shape
    pb, pe = padding
    d = dilation
    s = stride

    # pad once on the host side of the kernel (one fused pad); W rounded up
    # to the 8-sublane tiling and C to the 128-lane tiling so VMEM slices are
    # aligned (extra zero columns/channels contribute nothing to any tap)
    pw_raw = w + pb + pe
    w_align = (-pw_raw) % 8
    c_align = (-c) % 128
    xp = jnp.pad(x, ((0, 0), (pb, pe), (pb, pe + w_align), (0, c_align)))
    if c_align:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, c_align)))
    c_pad = c + c_align
    ph, pw_ = xp.shape[1], xp.shape[2]

    tc = 128 if c_pad % 128 == 0 else c_pad  # channel tile (lane dim)
    n_ct = c_pad // tc
    th_out = _pick_row_tile(oh)      # cotangent rows per grid step
    th_in = (th_out - 1) * s + 2 * d + 1  # haloed input rows needed
    n_ht = oh // th_out

    def kernel(xp_hbm, g_ref, out_ref, x_vmem, sem):
        ct = pl.program_id(0)
        ni = pl.program_id(1)
        hi = pl.program_id(2)

        # DMA the haloed input tile: rows [hi*th_out*s, +th_in)
        row0 = hi * (th_out * s)
        cp = pltpu.make_async_copy(
            xp_hbm.at[ni, pl.ds(row0, th_in), :, pl.ds(ct * tc, tc)],
            x_vmem,
            sem,
        )
        cp.start()

        @pl.when(jnp.logical_and(ni == 0, hi == 0))
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        cp.wait()
        xt = x_vmem[...]       # (th_in, pw_, tc) bf16
        gt = g_ref[0]          # (th_out, ow, tc) bf16

        for i in range(3):
            for j in range(3):
                tap = lax.slice(
                    xt,
                    (i * d, j * d, 0),
                    (i * d + (th_out - 1) * s + 1,
                     j * d + (ow - 1) * s + 1, tc),
                    (s, s, 1),
                )
                # fp32 operands BEFORE the product — matches the slice-form
                # wgrad it replaces (bf16 products add a rounding per MAC)
                out_ref[i, j, :] += jnp.sum(
                    tap.astype(jnp.float32) * gt.astype(jnp.float32),
                    axis=(0, 1),
                )

    out = pl.pallas_call(
        kernel,
        grid=(n_ct, n, n_ht),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp stays in HBM
            pl.BlockSpec(
                (1, th_out, ow, tc),
                lambda ct, ni, hi: (ni, hi, 0, ct),
            ),
        ],
        out_specs=pl.BlockSpec((3, 3, tc), lambda ct, ni, hi: (0, 0, ct)),
        out_shape=jax.ShapeDtypeStruct((3, 3, c_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th_in, pw_, tc), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, g)
    return out[:, :, :c]
