"""Pallas TPU kernel: 3x3 full-conv weight gradient for the entry convs.

The custom VJP in ops/conv_small_ch.py computes the wgrad of the
lane-starved entry convs (conv1 16->32 @768x1152 s2, conv2 32->64 @384x576
s1 — deeplab_xception.py:145-149) as nine strided-slice x cotangent
einsums.  XLA materializes each strided tap: ~13 ms/step of slice ops in
the fused-model trace (8 slices of 14 MB each + their reduce fusions).

This kernel computes all nine taps from ONE residency per (image,
row-tile) grid step:

    dk[i,j,ci,co] = sum_{n,r,c} xp[n, r*s+i, c*s+j, ci] * g[n,r,c,co]

* stride 1: one row-haloed window of the padded input; taps are unit
  slices.
* stride 2: Mosaic cannot stride-2-slice the sublane dim, so the padded
  input is pre-split OUTSIDE the kernel into four polyphase parity planes
  ``xp[:, p::2, q::2, :]`` (two cheap XLA slices per axis instead of nine
  14 MB strided taps); in-kernel, tap (i,j) is a unit slice of plane
  (i%2, j%2) shifted by (i//2, j//2).

Each tap is an MXU ``(P, ci)^T @ (P, co)`` contraction with fp32
accumulation into a grid-revisited (3, 3, ci, co) output (sequential TPU
grid; same accumulation pattern as fused_sepconv's d_pw).  bf16 operands
feed the MXU directly — bf16xbf16->fp32 MACs, numerically equivalent to
the slice form's fp32-upcast products.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(oh: int, cap: int = 32) -> int:
    for t in range(min(cap, oh), 0, -1):
        if oh % t == 0:
            return t
    return 1


def _wgrad_s1(xp, g, interpret):
    """xp: (N, OH+2, W+2, CI) padded input; g: (N, OH, OW, CO)."""
    n, hp, wp, ci = xp.shape
    _, oh, ow, co = g.shape
    th = _pick_tile(oh)

    def kernel(x_ref, g_ref, out_ref):
        @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        xt = x_ref[0]                       # (th+2, wp, ci)
        gt = g_ref[0].reshape(th * ow, co)  # (P, co)
        for i in range(3):
            for j in range(3):
                tap = xt[i:i + th, j:j + ow, :].reshape(th * ow, ci)
                out_ref[i, j] += lax.dot_general(
                    tap, gt, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    return pl.pallas_call(
        kernel,
        grid=(n, oh // th),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(th + 2), pl.Element(wp),
                 pl.Element(ci)),
                lambda ni, hi: (ni, hi * th, 0, 0),
            ),
            pl.BlockSpec((1, th, ow, co), lambda ni, hi: (ni, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((3, 3, ci, co), lambda ni, hi: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, 3, ci, co), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, g)


def _wgrad_s2(planes, g, interpret):
    """planes: 4 polyphase views (N, HP/2, WP/2, CI) of the padded input
    in (row-parity, col-parity) order [00, 01, 10, 11]; g: (N, OH, OW, CO).
    """
    n, php, pwp, ci = planes[0].shape
    _, oh, ow, co = g.shape
    th = _pick_tile(oh)

    def kernel(x00, x01, x10, x11, g_ref, out_ref):
        @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        xs = ((x00, x01), (x10, x11))
        gt = g_ref[0].reshape(th * ow, co)
        for i in range(3):
            for j in range(3):
                plane = xs[i % 2][j % 2][0]     # (th+1, pwp, ci)
                r0, c0 = i // 2, j // 2
                tap = plane[r0:r0 + th, c0:c0 + ow, :].reshape(th * ow, ci)
                out_ref[i, j] += lax.dot_general(
                    tap, gt, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    plane_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(th + 1), pl.Element(pwp),
         pl.Element(ci)),
        lambda ni, hi: (ni, hi * th, 0, 0),
    )
    return pl.pallas_call(
        kernel,
        grid=(n, oh // th),
        in_specs=[plane_spec] * 4 + [
            pl.BlockSpec((1, th, ow, co), lambda ni, hi: (ni, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((3, 3, ci, co), lambda ni, hi: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, 3, ci, co), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*planes, g)


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def conv3x3_wgrad_pallas(x, g, *, stride: int = 1,
                         interpret: bool = False) -> jax.Array:
    """dk[i,j,ci,co] for a 3x3 conv with padding (1,1) and the given stride.

    x: (N, H, W, CI); g: (N, OH, OW, CO).  Returns (3, 3, CI, CO) fp32.
    """
    n, h, w, ci = x.shape
    _, oh, ow, co = g.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    if stride == 1:
        return _wgrad_s1(xp, g, interpret)
    if stride == 2:
        # pad to even extents so the parity split is exact and every tap
        # lands in-bounds (extra zero rows/cols contribute nothing)
        hp, wp = xp.shape[1], xp.shape[2]
        xp = jnp.pad(xp, ((0, 0), (0, hp % 2), (0, wp % 2), (0, 0)))
        planes = [
            xp[:, p::2, q::2, :] for p in (0, 1) for q in (0, 1)
        ]
        # each plane needs rows [0, oh + 1): guaranteed since
        # HP/2 = (2*oh + pad)/2 >= oh + 1
        return _wgrad_s2(planes, g, interpret)
    raise NotImplementedError(f"stride {stride}")
