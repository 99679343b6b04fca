"""Custom VJP for the decoder's exact-x2 transposed conv (k3, s2, p1, op1).

The reference decoder upsamples with four ``ConvTranspose2d(k=3, s=2, p=1,
output_padding=1)`` layers (``deeplab_xception.py:352-374``).  The forward
dilated (lhs_dilation) schedule is fine on TPU — XLA zero-skips it well
(PERF.md r1/r2 polyphase and d2s A/Bs) — but XLA's *autodiff through* the
dilated schedule is not: the r2 batch-4 step trace shows a ~26 ms/step storm
of full-size ``reverse`` / ``pad`` / ``slice`` / ``copy`` ops over the
(4, 384, 576, 256) fp32 intermediates around deconv3/last_deconv.

This custom VJP keeps the XLA forward and replaces the backward with the
transpose identities (verified exactly against ``jax.vjp`` of the dilated
form; see tests/test_deconv_vjp.py):

* ``dx``: the linear transpose of an exact-x2 transposed conv is a plain
  3x3/stride-2/pad-(1,0) convolution of ``dy`` with the I/O-transposed
  kernel — a standard strided conv, no dilation anywhere.
* ``dk``: the weight gradient equals the wgrad of that same 3x3/s2 conv
  with roles swapped (input = ``dy``, cotangent = ``x``): each kernel tap
  touches exactly ONE phase of ``s2d(dy)``, so nine per-phase fp32 einsums
  over the once-padded ``s2d(dy)`` compute it at the inherent FLOP count —
  instead of XLA's nine reversed/strided slices at dilated resolution.

Operands are upcast to fp32 before every product and accumulated in fp32
(same policy as ops/conv_small_ch.py wgrad).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from deepcam_tpu.ops.conv_small_ch import _S2D_SEL, _s2d, _s2d_inv


def _dilated_fwd(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Textbook transposed conv: input-dilated conv with the flipped kernel.

    k3/s2/p1/op1 ⇒ window pad (k-1-p, k-1-p+op) = (1, 2) on each axis; the
    output is exactly (2H, 2W).
    """
    kf = jnp.flip(kernel, axis=(0, 1))
    return lax.conv_general_dilated(
        x, kf, (1, 1), ((1, 2), (1, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# (tap index dh/dw, output phase a/b) → flipped-kernel index (∅ = zero slot)
_D2S_SEL = {(0, 0): 1, (0, 1): 0, (1, 1): 2}


def _block_conv_fwd(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """The d2s schedule's dense 2x2/s1 conv emitting all four output phases
    as (N, H, W, (a, b, F)) block-space channels — WITHOUT the final
    depth-to-space shuffle."""
    f = kernel.shape[-1]
    c = x.shape[-1]
    kf = jnp.flip(kernel, axis=(0, 1))
    zero = jnp.zeros_like(kf[0, 0])

    def tap(dh, a, dw, b):
        if (dh, a) in _D2S_SEL and (dw, b) in _D2S_SEL:
            return kf[_D2S_SEL[(dh, a)], _D2S_SEL[(dw, b)]]
        return zero

    k2 = jnp.stack([
        jnp.stack([
            jnp.stack([
                jnp.stack([tap(dh, a, dw, b) for b in range(2)])
                for a in range(2)
            ])
            for dw in range(2)
        ])
        for dh in range(2)
    ])  # (dh, dw, a, b, C, F)
    k2 = k2.transpose(0, 1, 4, 2, 3, 5).reshape(2, 2, c, 4 * f)
    return lax.conv_general_dilated(
        x, k2, (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (N, H, W, (a, b, F))


def _d2s_fwd(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Same map as ``_dilated_fwd`` via ONE dense 2x2/s1 conv emitting all
    four output phases as 4F channels + depth-to-space (full MXU density; the
    phase/derivation comments live on ``ConvTranspose2d._d2s_k3s2``)."""
    f = kernel.shape[-1]
    y4 = _block_conv_fwd(x, kernel)
    return _s2d_inv(y4, f)


def _polyphase_fwd(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Same map via 4 dense phase convs + pixel shuffle — exactly the useful
    9·H·W·C·F MACs (no zero slots), no lhs_dilation anywhere (derivation on
    ``ConvTranspose2d._polyphase_k3s2``)."""
    f = kernel.shape[-1]
    kf = jnp.flip(kernel, axis=(0, 1))

    def phase_conv(taps, pad_h, pad_w):
        return lax.conv_general_dilated(
            x, taps, (1, 1), (pad_h, pad_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    y00 = phase_conv(kf[1:2, 1:2], (0, 0), (0, 0))
    y01 = phase_conv(kf[1:2, 0::2], (0, 0), (0, 1))
    y10 = phase_conv(kf[0::2, 1:2], (0, 1), (0, 0))
    y11 = phase_conv(kf[0::2, 0::2], (0, 1), (0, 1))
    y4 = jnp.concatenate([y00, y01, y10, y11], axis=-1)  # (ph, pw, F) lanes
    return _s2d_inv(y4, f)


_FWD_IMPLS = {"dilated": _dilated_fwd, "d2s": _d2s_fwd,
              "polyphase": _polyphase_fwd}


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def deconv3x3s2(x: jax.Array, kernel: jax.Array,
                method: str = "dilated") -> jax.Array:
    """Transposed conv (k=3, s=2, p=1, output_padding=1), NHWC/HWIO.

    ``kernel`` is (3, 3, C_in, F) in the layer's (unflipped) orientation;
    ``x`` is (N, H, W, C_in); the result is (N, 2H, 2W, F).  ``method``
    picks the forward schedule only ('dilated' or 'd2s' — identical math);
    the backward is always the custom s2d-block-space VJP below.
    """
    return _FWD_IMPLS[method](x, kernel)


def _fwd(x, kernel, method):
    return _FWD_IMPLS[method](x, kernel), (x, kernel)


def _bwd(method, res, g):
    del method  # backward is schedule-independent
    x, kernel = res
    n, h, w, c = x.shape
    f = kernel.shape[-1]

    g = g.astype(x.dtype)

    # dx: the linear transpose of the exact-x2 transposed conv is a PLAIN
    # 3x3/stride-2 conv of dy with the I/O-transposed (unflipped) kernel and
    # padding (1, 0) per axis — standard layouts, no dilation anywhere.
    kt = kernel.transpose(0, 1, 3, 2).astype(x.dtype)  # (3, 3, F, C)
    dx = lax.conv_general_dilated(
        g, kt, (2, 2), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    # dk: the wgrad of that same s2 conv with roles swapped (input = dy,
    # cotangent = x).  Each kernel tap (ky, kx) touches exactly ONE phase of
    # s2d(dy) at a 0/-1 block shift, so nine per-phase einsums over the
    # once-padded s2d(dy) compute it at the inherent FLOP count (no d2s
    # tap-slot overdo) with lane-aligned channel slices (offsets are
    # multiples of F).  Operands stay bf16: products of bf16-valued inputs
    # are exact in the MXU's fp32 accumulator (preferred_element_type), so
    # this equals the fp32-operand form while halving operand bytes — an
    # explicit x.astype(f32) materialized ~906 MB of fp32 copies/pads
    # around last_deconv's (4,384,576,256) residual (r2 trace).

    if f <= 16:
        gs = _s2d(g)  # (N, H, W, (ph, pw, F))
        gp = jnp.pad(gs, ((0, 0), (1, 0), (1, 0), (0, 0)))

        def tap(ky, kx):
            bh, ph = _S2D_SEL[ky]
            bw, pw = _S2D_SEL[kx]
            off = (ph * 2 + pw) * f
            return lax.slice(
                gp, (0, bh, bw, off), (n, bh + h, bw + w, off + f))

        # Small-F (last_deconv: F = n_classes): nine separate einsums would
        # re-read the big ``x`` operand 9x (measured 6.8 GB for 25 GFLOP at
        # (4,384,576,256), r2 trace).  Stack the nine F-wide taps
        # channel-wise (9F lanes — still tiny) and contract x ONCE.
        taps = jnp.concatenate(
            [tap(ky, kx) for ky in range(3) for kx in range(3)], axis=-1)
        dkt = jnp.einsum(
            "nhwk,nhwc->kc", taps, x,
            preferred_element_type=jnp.float32,
        ).reshape(3, 3, f, c)
    else:
        # View-einsum form: contract directly over the (N,H,2,W,2,F)
        # reshaped VIEW of dy — no s2d transpose materialization (measured
        # 3.4 ms at deconv3, r2 trace) and dy/x each read only 4x.  The
        # four shift-einsums produce all 16 (phase, shift) combos; the nine
        # real taps are selected from them (1.78x MAC overdo on an
        # MXU-dense contraction beats the formatting+re-read traffic).
        gview = g.reshape(n, h, 2, w, 2, f)
        xe = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        E = {}
        for dh in range(2):
            for dw in range(2):
                xs = lax.slice(xe, (0, dh, dw, 0), (n, dh + h, dw + w, c))
                E[(dh, dw)] = jnp.einsum(
                    "nipjqf,nijc->pqfc", gview, xs,
                    preferred_element_type=jnp.float32,
                )
        # (phase, x-shift) per kernel tap index: ky=0 reads dy phase 1 one
        # block above (x shift +1); ky=1 phase 0; ky=2 phase 1 in place.
        sel = {0: (1, 1), 1: (0, 0), 2: (1, 0)}
        rows = []
        for ky in range(3):
            ph, dh = sel[ky]
            cols = []
            for kx in range(3):
                pw, dw = sel[kx]
                cols.append(E[(dh, dw)][ph, pw])
            rows.append(jnp.stack(cols))
        dkt = jnp.stack(rows)  # (3, 3, F, C)
    dk = dkt.transpose(0, 1, 3, 2)
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


deconv3x3s2.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# block-space output variant
# ---------------------------------------------------------------------------

_S2D_INV = {v: k for k, v in _S2D_SEL.items()}  # (block shift, phase) → ky


@jax.custom_vjp
def deconv3x3s2_blocks(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """``deconv3x3s2`` that returns BLOCK-SPACE output (N, H, W, (a, b, F)):
    channel index = (row phase a, col phase b, F), i.e. exactly
    ``_s2d(deconv3x3s2(x, kernel))`` — without ever materializing the
    full-resolution (N, 2H, 2W, F) tensor or its layout conversions.

    Motivation (r2 trace): the final decoder deconv's tiny F = n_classes
    makes every full-res schedule pick pathological layouts — the dilated
    form drags batch-in-sublane conv layouts through the preceding BN/ReLU
    (~14 ms/step of reformat copies around deconv3_bn at batch 4) and the
    d2s form's pixel-shuffle poisons the loss consumers (PERF.md r2).  The
    weighted-CE loss and IoU are pixel-order-invariant, so the train step
    can consume block space directly (labels space-to-depth'd to match);
    parity: the reference computes the same loss on the same pixel multiset
    (``train_hdf5_ddp.py:352-356``).

    The backward never leaves block space either: dx is one dense 2x2/s1
    conv of the block cotangent with the block-space transposed kernel; dk
    re-uses the per-phase tap einsums with the cotangent ALREADY in s2d
    layout (the ``_s2d(dy)`` transpose of the full-res path vanishes).
    """
    return _block_conv_fwd(x, kernel)


def _blk_fwd(x, kernel):
    return _block_conv_fwd(x, kernel), (x, kernel)


def _blk_bwd(res, gb):
    x, kernel = res
    n, h, w, c = x.shape
    f = kernel.shape[-1]
    gb = gb.astype(x.dtype)  # (N, H, W, (a, b, F))

    # dx[i,j,c] = Σ_{ky,kx,f} dy_full[2i-1+ky, 2j-1+kx, f]·kt[ky,kx,f,c];
    # with 2i-1+ky = 2(i-1+bh)+ph and (bh, ph) = _S2D_SEL[ky] this is ONE
    # dense 2x2/s1 conv of gb (pad (1,0)) with the block-space kernel
    # K2[bh, bw, (ph, pw, f), c] = kt[ky, kx, f, c] (7 of 16 slots zero).
    kt = kernel.transpose(0, 1, 3, 2).astype(x.dtype)  # (3, 3, F, C)
    zero = jnp.zeros_like(kt[0, 0])

    def tapk(bh, ph, bw, pw):
        if (bh, ph) in _S2D_INV and (bw, pw) in _S2D_INV:
            return kt[_S2D_INV[(bh, ph)], _S2D_INV[(bw, pw)]]
        return zero

    k2 = jnp.stack([
        jnp.stack([
            jnp.stack([
                jnp.stack([tapk(bh, a, bw, b) for b in range(2)])
                for a in range(2)
            ])
            for bw in range(2)
        ])
        for bh in range(2)
    ])  # (bh, bw, a, b, F, C)
    k2 = k2.reshape(2, 2, 4 * f, c)
    dx = lax.conv_general_dilated(
        gb, k2, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    # dk: per-phase tap einsums of the full-res path, but the cotangent is
    # already in s2d layout — slice the once-padded gb directly.  bf16
    # operands, fp32 MXU accumulation (exact for bf16 inputs).
    gp = jnp.pad(gb, ((0, 0), (1, 0), (1, 0), (0, 0)))

    def tapg(ky, kx):
        bh, ph = _S2D_SEL[ky]
        bw, pw = _S2D_SEL[kx]
        off = (ph * 2 + pw) * f
        return lax.slice(gp, (0, bh, bw, off), (n, bh + h, bw + w, off + f))

    taps = jnp.concatenate(
        [tapg(ky, kx) for ky in range(3) for kx in range(3)], axis=-1)
    dkt = jnp.einsum(
        "nhwk,nhwc->kc", taps, x, preferred_element_type=jnp.float32,
    ).reshape(3, 3, f, c)
    dk = dkt.transpose(0, 1, 3, 2)
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


deconv3x3s2_blocks.defvjp(_blk_fwd, _blk_bwd)


def space_to_blocks(y: jax.Array, factor: int = 2) -> jax.Array:
    """(N, f·H, f·W, ...) → (N, H, W, f², ...) with block index =
    (row phase, col phase) — the label/logit reshuffle matching
    ``deconv3x3s2_blocks`` (factor 2) / ``deconv3x3s2_blocks2`` (factor 4)
    channel order.  Trailing dims (e.g. a class axis) are preserved."""
    f = factor
    n, hf, wf = y.shape[:3]
    rest = y.shape[3:]
    y = y.reshape(n, hf // f, f, wf // f, f, *rest)
    y = jnp.moveaxis(y, 2, 3)  # (N, H, W, r, s, ...)
    return y.reshape(n, hf // f, wf // f, f * f, *rest)


# ---------------------------------------------------------------------------
# second-stage block-space deconv (consume blocks, emit x4 blocks)
# ---------------------------------------------------------------------------

def _blocks2_kernel(kernel: jax.Array) -> jax.Array:
    """(3, 3, C, F) → (2, 2, 4C, 16F): the composite kernel that applies the
    exact-x2 transposed conv to an input ALREADY in (a, b, C) block space
    (the previous x2 stage's output blocks at half resolution), emitting the
    x4 output as (r, s, F) quarter-resolution blocks, r = full-res row % 4.

    Per-axis derivation: the block form reads 2x-res pixel I+dh (dh ∈ {0,1},
    ``_block_conv_fwd``); with I = 2i + A and the input stored as blocks
    (tile i', phase a'), I + dh = 2(i + u) + a' where u = (A + dh) // 2 —
    so output 4-phase r = 2A + α needs input tap (u, a') with
    dh = 2u + a' - A ∈ {0, 1} and the usual d2s slot (dh, α) ∈ _D2S_SEL;
    everything else is a zero slot.  One dense 2x2/s1 conv with 4C input
    lanes — MXU-dense, no lhs_dilation, ~4x MAC overdo on a tiny-F layer
    (negligible) in exchange for never materializing full resolution."""
    c, f = kernel.shape[2], kernel.shape[3]
    kf = jnp.flip(kernel, axis=(0, 1))
    zero = jnp.zeros_like(kf[0, 0])

    def slot(u, ap, r):
        a_hi, alpha = r // 2, r % 2
        dh = 2 * u + ap - a_hi
        if dh in (0, 1) and (dh, alpha) in _D2S_SEL:
            return _D2S_SEL[(dh, alpha)]
        return None

    # dims: (u, v, a', b', C, r, s, F)
    k2 = jnp.stack([
        jnp.stack([
            jnp.stack([
                jnp.stack([
                    jnp.stack([
                        jnp.stack([
                            kf[slot(u, ap, r), slot(v, bp, s)]
                            if slot(u, ap, r) is not None
                            and slot(v, bp, s) is not None else zero
                            for s in range(4)
                        ], axis=1)  # (C, s, F)
                        for r in range(4)
                    ], axis=1)  # (C, r, s, F)
                    for bp in range(2)
                ])
                for ap in range(2)
            ])
            for v in range(2)
        ])
        for u in range(2)
    ])  # (u, v, a', b', C, r, s, F)
    return k2.reshape(2, 2, 4 * c, 16 * f)


def deconv3x3s2_blocks2(z: jax.Array, kernel: jax.Array) -> jax.Array:
    """Apply the k3/s2/p1/op1 transposed conv to a BLOCK-SPACE input
    ``z`` (N, H, W, (a, b, C)) — the (half-res tile, x2 phase) layout of
    ``deconv3x3s2_blocks``'s output — returning (N, H, W, (r, s, F)) with
    r/s the full-res row/col phases mod 4.  Equals
    ``space_to_blocks(deconv3x3s2(blocks⁻¹(z), kernel), 4)`` flattened,
    with no full-res intermediate.  Plain s1 conv: XLA autodiff is clean
    (dgrad = flipped-kernel s1 conv, wgrad = standard)."""
    k2 = _blocks2_kernel(kernel.astype(z.dtype))
    return lax.conv_general_dilated(
        z, k2, (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
