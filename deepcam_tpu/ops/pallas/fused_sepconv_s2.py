"""Pallas TPU kernel: fused [BN-affine →] depthwise-3x3/stride-2 → pointwise.

The three XceptionBlock *tail* sepconvs (``sepconv_stride`` — reference
``SeparableConv2d_same`` with stride 2 inside ``Block``,
``deeplab_xception.py:69-122``; executed at (384,576,128), (192,288,256),
(96,144,728)) are the last sepconv family member still on the unfused XLA
path: the preceding rep-BN's apply is a separate full-resolution FMA pass,
the stride-2 depthwise materializes its half-res output, and the pointwise
reads it back.  At entry resolution that is ~1.8 GB/step of avoidable HBM
traffic (r2 trace: block1 bwd 19.1 ms, 7.7 GB).

Phase form: with x's four space-to-depth phases ``x_ab[r, w] = x[2r+a,
2w+b]`` (XLA-side strided slices, quarter-size each), the stride-2 'same'
depthwise  ``out[r, w] = Σ_ij k[i, j] · x[2r+i-1, 2w+j-1]``  becomes nine
taps that each read ONE phase at a row shift ∈ {0, +1} and a column shift
∈ {0, −1}:

    (i=0) row 2r−1 → phase a=1, block row r−1   (top halo: 1 padded row)
    (i=1) row 2r   → phase a=0, block row r
    (i=2) row 2r+1 → phase a=1, block row r
    (j=0) col 2w−1 → phase b=1, block col w−1   (zero W edge in-kernel)
    (j=1) col 2w   → phase b=0, block col w
    (j=2) col 2w+1 → phase b=1, block col w

so the kernel is stride-1-like over quarter-res operands: per (image,
row-tile) grid step it applies the optional per-channel affine (the folded
BN apply), forms the nine taps (fp32), rounds to bf16 exactly where the
unfused path rounds the depthwise output, and feeds the MXU pointwise.
The custom-VJP backward computes all of {dx (4 phases), d_dw, d_pw [, da,
db]} from one residency of (phases, g):  the pointwise dgrad ``dd = g @
pwᵀ`` needs one BOTTOM halo row (dx taps read dd[r] and dd[r+1]) and the
phase gradients are 1-2 tap combinations of dd — crucially the stride-2
depthwise dgrad never materializes the XLA lhs-dilation zero-insertion
form.  dx returns to full resolution via a reshape/transpose interleave
(no scatter).

Cross-grid fp32 accumulation for d_dw/d_pw/da/db follows
ops/pallas/fused_sepconv.py (sequential TPU grid, constant index maps).
Supported: stride 2, dilation 1, even H/W, no pre-ReLU (the tails are
"bare": no ReLU precedes them — the affine comes from the preceding BN
when bn_fold is active).  Opt-in via DEEPCAM_FUSED_S2=1 pending the TPU
A/B; CPU-interpret parity in tests/test_fused_sepconv_s2.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_sepconv import _shift_w


def _pick_row_tile_s2(h2: int, w2: int, c: int, f: int) -> int:
    """Rows (of the half-res output) per grid step: largest divisor of h2
    within the tile cap whose estimated backward working set fits."""
    import os

    cap = int(os.environ.get("DEEPCAM_FUSED_S2_TH", "16"))
    budget = int(os.environ.get("DEEPCAM_FUSED_VMEM_MB", "96")) << 20

    def est_bytes(t: int) -> int:
        cl = -(-c // 128) * 128
        fl = -(-f // 128) * 128
        f32, bf16 = 4, 2
        return (
            f32 * (t + 1) * w2 * cl            # dd (+1 halo row)
            + 4 * f32 * t * w2 * cl            # dx accumulators / taps
            + bf16 * 2 * (t + 1) * w2 * (4 * cl + fl)  # phases+g dbl-buf
            + f32 * cl * fl + bf16 * cl * fl   # dpw acc + pw^T
            + bf16 * 2 * 4 * t * w2 * cl       # dx outs double-buffered
        )

    best = 1
    for t in range(1, min(cap, h2) + 1):
        if h2 % t == 0 and est_bytes(t) <= budget:
            best = t
    return best


def _affine_zero_top(t, hi, *, valid_from: int):
    """Zero rows of a top-padded phase tile whose global padded-row index
    is < ``valid_from`` (the stored pad rows are zeros, but after the
    in-kernel affine 0·a + b ≠ 0)."""
    r = lax.broadcasted_iota(jnp.int32, (t.shape[0], 1, 1), 0)
    return jnp.where(r + hi >= valid_from, t, jnp.zeros((), t.dtype))


def _plain_spec(th, w2, c):
    return pl.BlockSpec((1, th, w2, c), lambda ni, hi: (ni, hi, 0, 0))


def _halo1_spec(th, w2, c):
    """Overlapping (th+1)-row Element window starting at row hi*th of a
    1-row-padded operand — all starts in-bounds."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(th + 1), pl.Element(w2), pl.Element(c)),
        lambda ni, hi: (ni, hi * th, 0, 0),
    )


def _fwd_pallas_s2(x00, x01, x10p, x11p, dwk, pwk, *, ab=None,
                   interpret: bool = False):
    """x00/x01: (N, H2, W2, C); x10p/x11p: top-1-padded (N, H2+1, W2, C).
    Returns (N, H2, W2, F)."""
    n, h2, w2, c = x00.shape
    f = pwk.shape[-1]
    th = _pick_row_tile_s2(h2, w2, c, f)
    affine = ab is not None

    def kernel(*refs):
        if affine:
            r00, r01, r10, r11, a_ref, b_ref, dwk_ref, pwk_ref = refs[:8]
            out_ref = refs[8]
        else:
            r00, r01, r10, r11, dwk_ref, pwk_ref = refs[:6]
            out_ref = refs[6]
        hi = pl.program_id(1)
        t00, t01 = r00[0], r01[0]
        t10, t11 = r10[0], r11[0]
        if affine:
            a, b = a_ref[0], b_ref[0]
            t00 = t00 * a + b
            t01 = t01 * a + b
            t10 = _affine_zero_top(t10 * a + b, hi * th, valid_from=1)
            t11 = _affine_zero_top(t11 * a + b, hi * th, valid_from=1)
        k32 = dwk_ref[...].astype(jnp.float32)

        def f32(t):
            return t.astype(jnp.float32)

        # nine taps (see module docstring for the (i, j) → phase map)
        acc = (
            f32(t00) * k32[1, 1]
            + f32(t01) * k32[1, 2]
            + f32(_shift_w(t01, -1)) * k32[1, 0]
            + f32(t10[:th]) * k32[0, 1]
            + f32(t10[1:]) * k32[2, 1]
            + f32(t11[:th]) * k32[0, 2]
            + f32(_shift_w(t11[:th], -1)) * k32[0, 0]
            + f32(t11[1:]) * k32[2, 2]
            + f32(_shift_w(t11[1:], -1)) * k32[2, 0]
        )
        d = acc.astype(x00.dtype).reshape(th * w2, c)
        y = jnp.dot(d, pwk_ref[...], preferred_element_type=jnp.float32)
        out_ref[0] = y.astype(out_ref.dtype).reshape(th, w2, f)

    vec_spec = pl.BlockSpec((1, c), lambda ni, hi: (0, 0))
    in_specs = [
        _plain_spec(th, w2, c), _plain_spec(th, w2, c),
        _halo1_spec(th, w2, c), _halo1_spec(th, w2, c),
    ]
    operands = [x00, x01, x10p, x11p]
    if affine:
        in_specs += [vec_spec, vec_spec]
        operands += [ab[0], ab[1]]
    in_specs += [
        pl.BlockSpec((3, 3, c), lambda ni, hi: (0, 0, 0)),
        pl.BlockSpec((c, f), lambda ni, hi: (0, 0)),
    ]
    operands += [dwk, pwk]

    return pl.pallas_call(
        kernel,
        grid=(n, h2 // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w2, f), lambda ni, hi: (ni, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h2, w2, f), x00.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def _bwd_pallas_s2(x00, x01, x10p, x11p, gp, dwk, pwk_t, *, ab=None,
                   interpret: bool = False):
    """gp: bottom-1-padded (N, H2+1, W2, F).  Returns (dx00, dx01, dx10,
    dx11) in x dtype, d_dw (3,3,C) fp32, d_pw (C,F) fp32 [, da, db]."""
    n, h2, w2, c = x00.shape
    f = pwk_t.shape[0]
    th = _pick_row_tile_s2(h2, w2, c, f)
    affine = ab is not None

    def kernel(*refs):
        idx = 5
        r00, r01, r10, r11, g_ref = refs[:5]
        if affine:
            a_ref, b_ref = refs[idx:idx + 2]
            idx += 2
        dwk_ref, pwt_ref = refs[idx:idx + 2]
        outs = refs[idx + 2:]
        if affine:
            (d00_ref, d01_ref, d10_ref, d11_ref, ddw_ref, dpw_ref,
             da_ref, db_ref) = outs
        else:
            d00_ref, d01_ref, d10_ref, d11_ref, ddw_ref, dpw_ref = outs
        ni = pl.program_id(0)
        hi = pl.program_id(1)

        @pl.when(jnp.logical_and(ni == 0, hi == 0))
        def _():
            ddw_ref[...] = jnp.zeros_like(ddw_ref)
            dpw_ref[...] = jnp.zeros_like(dpw_ref)
            if affine:
                da_ref[...] = jnp.zeros_like(da_ref)
                db_ref[...] = jnp.zeros_like(db_ref)

        t00, t01 = r00[0], r01[0]
        t10, t11 = r10[0], r11[0]
        if affine:
            a, b = a_ref[0], b_ref[0]
            h00 = t00 * a + b
            h01 = t01 * a + b
            h10 = _affine_zero_top(t10 * a + b, hi * th, valid_from=1)
            h11 = _affine_zero_top(t11 * a + b, hi * th, valid_from=1)
        else:
            h00, h01, h10, h11 = t00, t01, t10, t11

        gt = g_ref[0]  # (th+1, W2, F); last row is the bottom halo
        dd = jnp.dot(
            gt.reshape((th + 1) * w2, f), pwt_ref[...],
            preferred_element_type=jnp.float32,
        ).reshape(th + 1, w2, c)
        ddc = dd[:th]          # dd[r]
        ddn = dd[1:]           # dd[r+1]
        ddc_s = _shift_w(ddc, 1)   # dd[r, w+1]
        ddn_s = _shift_w(ddn, 1)   # dd[r+1, w+1]
        k32 = dwk_ref[...].astype(jnp.float32)

        dx00 = ddc * k32[1, 1]
        dx01 = ddc_s * k32[1, 0] + ddc * k32[1, 2]
        dx10 = ddn * k32[0, 1] + ddc * k32[2, 1]
        dx11 = (ddn_s * k32[0, 0] + ddn * k32[0, 2]
                + ddc_s * k32[2, 0] + ddc * k32[2, 2])

        if affine:
            # gradient at u = x·a + b, per phase; center rows of the haloed
            # phases align with this tile's dx rows
            x_c = (t00.astype(jnp.float32), t01.astype(jnp.float32),
                   t10[1:].astype(jnp.float32), t11[1:].astype(jnp.float32))
            da_ref[...] += sum(
                jnp.sum(dx * xc, axis=(0, 1))
                for dx, xc in zip((dx00, dx01, dx10, dx11), x_c)
            )[None, :]
            db_ref[...] += sum(
                jnp.sum(dx, axis=(0, 1))
                for dx in (dx00, dx01, dx10, dx11)
            )[None, :]
            a32 = a_ref[0].astype(jnp.float32)
            dx00, dx01 = dx00 * a32, dx01 * a32
            dx10, dx11 = dx10 * a32, dx11 * a32
        d00_ref[0] = dx00.astype(d00_ref.dtype)
        d01_ref[0] = dx01.astype(d01_ref.dtype)
        d10_ref[0] = dx10.astype(d10_ref.dtype)
        d11_ref[0] = dx11.astype(d11_ref.dtype)

        # depthwise wgrad: the nine forward taps against dd center rows
        def f32(t):
            return t.astype(jnp.float32)

        taps = (
            ((0, 0), _shift_w(h11[:th], -1)), ((0, 1), h10[:th]),
            ((0, 2), h11[:th]),
            ((1, 0), _shift_w(h01, -1)), ((1, 1), h00), ((1, 2), h01),
            ((2, 0), _shift_w(h11[1:], -1)), ((2, 1), h10[1:]),
            ((2, 2), h11[1:]),
        )
        for (i, j), tap in taps:
            ddw_ref[i, j, :] += jnp.sum(f32(tap) * ddc, axis=(0, 1))

        # pointwise wgrad: recompute d (rounded exactly as the forward)
        acc = (
            f32(h00) * k32[1, 1]
            + f32(h01) * k32[1, 2]
            + f32(_shift_w(h01, -1)) * k32[1, 0]
            + f32(h10[:th]) * k32[0, 1]
            + f32(h10[1:]) * k32[2, 1]
            + f32(h11[:th]) * k32[0, 2]
            + f32(_shift_w(h11[:th], -1)) * k32[0, 0]
            + f32(h11[1:]) * k32[2, 2]
            + f32(_shift_w(h11[1:], -1)) * k32[2, 0]
        )
        d = acc.astype(x00.dtype).reshape(th * w2, c)
        dpw_ref[...] += lax.dot_general(
            d, gt[:th].reshape(th * w2, f),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    vec_spec = pl.BlockSpec((1, c), lambda ni, hi: (0, 0))
    in_specs = [
        _plain_spec(th, w2, c), _plain_spec(th, w2, c),
        _halo1_spec(th, w2, c), _halo1_spec(th, w2, c),
        _halo1_spec(th, w2, f),
    ]
    operands = [x00, x01, x10p, x11p, gp]
    if affine:
        in_specs += [vec_spec, vec_spec]
        operands += [ab[0], ab[1]]
    in_specs += [
        pl.BlockSpec((3, 3, c), lambda ni, hi: (0, 0, 0)),
        pl.BlockSpec((f, c), lambda ni, hi: (0, 0)),
    ]
    operands += [dwk, pwk_t]

    out_specs = [_plain_spec(th, w2, c)] * 4 + [
        pl.BlockSpec((3, 3, c), lambda ni, hi: (0, 0, 0)),
        pl.BlockSpec((c, f), lambda ni, hi: (0, 0)),
    ]
    out_shape = [jax.ShapeDtypeStruct((n, h2, w2, c), x00.dtype)] * 4 + [
        jax.ShapeDtypeStruct((3, 3, c), jnp.float32),
        jax.ShapeDtypeStruct((c, f), jnp.float32),
    ]
    if affine:
        out_specs += [vec_spec, vec_spec]
        out_shape += [
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ]

    return pl.pallas_call(
        kernel,
        grid=(n, h2 // th),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# v2: in-kernel phase split over the FULL-RES operand
# ---------------------------------------------------------------------------
#
# v1 wins 1.62-1.75x standalone at every tail shape but loses whole-model
# (0.976x): its XLA-side glue — ``_phases`` (four strided slices + two pads
# of the full-res input per call) and ``_interleave`` (a transpose) on dx —
# costs more than the kernel saves (r2 A/B, PERF.md).  v2 removes the glue:
# the kernel reads the full-res operand directly through a clamped
# overlapping ``pl.Element`` window of 2·th+1 rows (ideal start 2·r0−1; only
# the FIRST tile clamps — the stride-2 geometry makes the last tile exact)
# and splits phases in VMEM with row/sublane strided selects; dx writes a
# full-res (2·th)-row tile directly (stack+reshape interleave in VMEM), so
# no XLA-side transpose or pad touches full resolution at all.  The
# half-res cotangent is likewise read unpadded through a (th+1)-row window
# whose LAST tile clamps (bottom halo).


def _pick_row_tile_s2v2(h2: int, w2: int, c: int, f: int,
                        affine: bool = False) -> int:
    """Half-res output rows per grid step: largest divisor of h2 (strictly
    below h2 — the 2·th+1 full-res window must fit the unpadded extent)
    whose estimated backward working set fits the VMEM budget.

    ``affine`` budgets the BN-folded variant's extras: a second
    window-sized tile (``ut = xt·a + b``) and a duplicated tap-split
    chain live alongside the raw taps in the backward.  r3 wave-5
    hardware probe: plain th=16 at block1 (384,576,128) measured
    107.8 MiB scoped of the 127 MiB limit and ran; the affine form at
    the same th died in the server-side Mosaic compile
    (tpu_compile_helper exit 1) while block2/3 — whose working sets are
    near-byte-identical but whose SUBLANE extent (full-res row width w)
    is half/quarter — passed both forms at th=16.  The byte model
    therefore cannot isolate the failure; key the affine demotion on
    the sublane extent instead: affine shapes with w ≥
    ``DEEPCAM_FUSED_S2_AFF_W`` (default 512, i.e. block1's 576 only)
    get their cap lowered to ``DEEPCAM_FUSED_S2_AFF_TH`` (default 12).
    block2/3 affine keep the hardware-validated th=16."""
    import os

    cap = int(os.environ.get("DEEPCAM_FUSED_S2_TH", "16"))
    budget = int(os.environ.get("DEEPCAM_FUSED_VMEM_MB", "96")) << 20
    w = 2 * w2
    if affine and w >= int(os.environ.get("DEEPCAM_FUSED_S2_AFF_W", "512")):
        cap = min(cap, int(os.environ.get("DEEPCAM_FUSED_S2_AFF_TH", "12")))

    def est_bytes(t: int) -> int:
        cl = -(-c // 128) * 128
        fl = -(-f // 128) * 128
        f32, bf16 = 4, 2
        base = (
            bf16 * 2 * (2 * t + 1) * w * cl      # x window double-buffered
            + bf16 * 2 * (t + 1) * w2 * fl       # g window double-buffered
            + f32 * (t + 1) * w2 * cl            # dd
            + 4 * f32 * t * w2 * cl              # dx phase accumulators
            + f32 * t * w2 * cl                  # live tap temporary
            + f32 * cl * fl + bf16 * cl * fl     # dpw acc + pw^T
            + bf16 * 2 * 2 * t * w * cl          # dx full-res out dbl-buf
        )
        if affine:
            base += (
                bf16 * (2 * t + 1) * w * cl      # ut affine window copy
                + 4 * f32 * t * w2 * cl          # duplicated phase taps
            )
        return base

    best = 1
    for t in range(1, min(cap, h2 - 1) + 1):
        if h2 % t == 0 and est_bytes(t) <= budget:
            best = t
    return best


def _x_window_spec_v2(th, h, w, c):
    """(2·th+1)-row Element window over the UNPADDED full-res operand,
    ideal start 2·hi·th − 1 clamped into bounds (only hi=0 clamps)."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(2 * th + 1), pl.Element(w),
         pl.Element(c)),
        lambda ni, hi: (ni, jnp.clip(2 * hi * th - 1, 0, h - 2 * th - 1),
                        0, 0),
    )


def _g_window_spec_v2(th, h2, w2, f):
    """(th+1)-row Element window over the UNPADDED half-res cotangent,
    ideal start hi·th clamped into bounds (only the last tile clamps)."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(th + 1), pl.Element(w2), pl.Element(f)),
        lambda ni, hi: (ni, jnp.clip(hi * th, 0, h2 - th - 1), 0, 0),
    )


def _fix_x_v2(t, hi):
    """hi=0's window starts at row 0 instead of −1: shift down one row and
    zero the top (the x[−1] halo)."""
    z = jnp.zeros_like(t[:1])
    down = jnp.concatenate([z, t[:-1]], axis=0)
    return jnp.where(hi == 0, down, t)


def _fix_g_v2(t, hi, nh):
    """The last tile's window starts one row early: shift up one row and
    zero the bottom (the g[h2] halo)."""
    z = jnp.zeros_like(t[:1])
    up = jnp.concatenate([t[1:], z], axis=0)
    return jnp.where(hi == nh - 1, up, t)


def _wsplit(s):
    """(rows, W, C) → the two column phases (rows, W/2, C): b=0 at even
    columns, b=1 at odd.  Via pair-reshape + static index: jnp's strided
    ``[:, 0::2]`` lowers to a >2-D gather and ``lax.slice`` strides to a
    stride-2 ``vector.extract_strided_slice`` — Mosaic rejects both; the
    (W/2, 2) reshape + index lowers to sublane shuffles."""
    rows, w, c = s.shape
    r = s.reshape(rows, w // 2, 2, c)
    return r[:, :, 0, :], r[:, :, 1, :]


def _split_taps_v2(xt, th):
    """Full-res window (2·th+1, W, C) → the v1 phase-tap tuple.  Logical
    window row j holds x row 2·r0 + j − 1: even j are the a=1 phase rows
    (with top halo), odd j the a=0 rows.  Row split via pair-reshape +
    static index (strided slicing does not lower under Mosaic; the row dim
    is untiled so this reshape is free)."""
    rows, w, c = xt.shape
    head = xt[:2 * th].reshape(th, 2, w, c)
    ev = jnp.concatenate([head[:, 0], xt[2 * th:]], axis=0)  # (th+1, W, C)
    od = head[:, 1]                                          # (th,   W, C)
    o0, o1 = _wsplit(od)
    e0, e1 = _wsplit(ev)
    return o0, o1, e0, e1


def _fwd_pallas_s2v2(x, dwk, pwk, *, ab=None, interpret: bool = False):
    """x: UNPADDED (N, H, W, C), even H/W.  Returns (N, H/2, W/2, F)."""
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    f = pwk.shape[-1]
    affine = ab is not None
    th = _pick_row_tile_s2v2(h2, w2, c, f, affine=affine)

    def kernel(*refs):
        if affine:
            x_ref, a_ref, b_ref, dwk_ref, pwk_ref, out_ref = refs
        else:
            x_ref, dwk_ref, pwk_ref, out_ref = refs
        hi = pl.program_id(1)
        xt = _fix_x_v2(x_ref[0], hi)
        if affine:
            xt = xt * a_ref[0] + b_ref[0]
            # the x[−1] halo must be zero AFTER the affine (0·a + b ≠ 0)
            r = lax.broadcasted_iota(jnp.int32, (xt.shape[0], 1, 1), 0)
            xt = jnp.where(r + 2 * hi * th - 1 >= 0, xt,
                           jnp.zeros((), xt.dtype))
        o0, o1, e0, e1 = _split_taps_v2(xt, th)
        k32 = dwk_ref[...].astype(jnp.float32)

        def f32(t):
            return t.astype(jnp.float32)

        acc = (
            f32(o0) * k32[1, 1]
            + f32(o1) * k32[1, 2]
            + f32(_shift_w(o1, -1)) * k32[1, 0]
            + f32(e0[:th]) * k32[0, 1]
            + f32(e0[1:]) * k32[2, 1]
            + f32(e1[:th]) * k32[0, 2]
            + f32(_shift_w(e1[:th], -1)) * k32[0, 0]
            + f32(e1[1:]) * k32[2, 2]
            + f32(_shift_w(e1[1:], -1)) * k32[2, 0]
        )
        d = acc.astype(x.dtype).reshape(th * w2, c)
        y = jnp.dot(d, pwk_ref[...], preferred_element_type=jnp.float32)
        out_ref[0] = y.astype(out_ref.dtype).reshape(th, w2, f)

    vec_spec = pl.BlockSpec((1, c), lambda ni, hi: (0, 0))
    in_specs = [_x_window_spec_v2(th, h, w, c)]
    operands = [x]
    if affine:
        in_specs += [vec_spec, vec_spec]
        operands += [ab[0], ab[1]]
    in_specs += [
        pl.BlockSpec((3, 3, c), lambda ni, hi: (0, 0, 0)),
        pl.BlockSpec((c, f), lambda ni, hi: (0, 0)),
    ]
    operands += [dwk, pwk]

    return pl.pallas_call(
        kernel,
        grid=(n, h2 // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w2, f), lambda ni, hi: (ni, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h2, w2, f), x.dtype),
        compiler_params=pltpu.CompilerParams(
            # 127 MiB: the v2 in-kernel splits cost more scoped stack than
            # the picker's estimate (block1 th=16 measured 107.8M on HW)
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def _bwd_pallas_s2v2(x, g, dwk, pwk_t, *, ab=None, interpret: bool = False):
    """x: UNPADDED (N, H, W, C); g: UNPADDED (N, H/2, W/2, F).  Returns
    the four quarter-res dx phases (N, H/2, W/2, C) in x dtype (the caller
    interleaves — see the in-kernel write comment), d_dw (3,3,C) fp32,
    d_pw (C,F) fp32 [, da, db]."""
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    f = pwk_t.shape[0]
    affine = ab is not None
    th = _pick_row_tile_s2v2(h2, w2, c, f, affine=affine)
    nh = h2 // th

    def kernel(*refs):
        idx = 2
        x_ref, g_ref = refs[:2]
        if affine:
            a_ref, b_ref = refs[idx:idx + 2]
            idx += 2
        dwk_ref, pwt_ref = refs[idx:idx + 2]
        outs = refs[idx + 2:]
        if affine:
            d00_ref, d01_ref, d10_ref, d11_ref, ddw_ref, dpw_ref, \
                da_ref, db_ref = outs
        else:
            d00_ref, d01_ref, d10_ref, d11_ref, ddw_ref, dpw_ref = outs
        ni = pl.program_id(0)
        hi = pl.program_id(1)

        @pl.when(jnp.logical_and(ni == 0, hi == 0))
        def _():
            ddw_ref[...] = jnp.zeros_like(ddw_ref)
            dpw_ref[...] = jnp.zeros_like(dpw_ref)
            if affine:
                da_ref[...] = jnp.zeros_like(da_ref)
                db_ref[...] = jnp.zeros_like(db_ref)

        xt = _fix_x_v2(x_ref[0], hi)
        o0r, o1r, e0r, e1r = _split_taps_v2(xt, th)
        if affine:
            ut = xt * a_ref[0] + b_ref[0]
            r = lax.broadcasted_iota(jnp.int32, (ut.shape[0], 1, 1), 0)
            ut = jnp.where(r + 2 * hi * th - 1 >= 0, ut,
                           jnp.zeros((), ut.dtype))
            ho0, ho1, he0, he1 = _split_taps_v2(ut, th)
        else:
            ho0, ho1, he0, he1 = o0r, o1r, e0r, e1r

        gt = _fix_g_v2(g_ref[0], hi, nh)  # (th+1, W2, F); last row = halo
        dd = jnp.dot(
            gt.reshape((th + 1) * w2, f), pwt_ref[...],
            preferred_element_type=jnp.float32,
        ).reshape(th + 1, w2, c)
        ddc = dd[:th]
        ddn = dd[1:]
        ddc_s = _shift_w(ddc, 1)
        ddn_s = _shift_w(ddn, 1)
        k32 = dwk_ref[...].astype(jnp.float32)

        dx00 = ddc * k32[1, 1]
        dx01 = ddc_s * k32[1, 0] + ddc * k32[1, 2]
        dx10 = ddn * k32[0, 1] + ddc * k32[2, 1]
        dx11 = (ddn_s * k32[0, 0] + ddn * k32[0, 2]
                + ddc_s * k32[2, 0] + ddc * k32[2, 2])

        # Lane-wise Σ over (rows, w2) as an MXU dot: the pair-reshape phase
        # selects leave sublane-offset layouts on the taps, and the
        # on-device Mosaic pass rejects float ADD multi_reductions over
        # offset dims ("input layout must have zero offsets...", r3 wave
        # 3); dots force clean operand relayouts.
        ones_row = jnp.ones((1, th * w2), jnp.float32)

        def lane_sum(t):
            return jnp.dot(ones_row, t.reshape(th * w2, t.shape[-1]),
                           preferred_element_type=jnp.float32)[0]

        if affine:
            x_c = (o0r.astype(jnp.float32), o1r.astype(jnp.float32),
                   e0r[1:].astype(jnp.float32), e1r[1:].astype(jnp.float32))
            da_ref[...] += sum(
                lane_sum(dx * xc)
                for dx, xc in zip((dx00, dx01, dx10, dx11), x_c)
            )[None, :]
            db_ref[...] += sum(
                lane_sum(dx) for dx in (dx00, dx01, dx10, dx11)
            )[None, :]
            a32 = a_ref[0].astype(jnp.float32)
            dx00, dx01 = dx00 * a32, dx01 * a32
            dx10, dx11 = dx10 * a32, dx11 * a32

        # Emit the four phase grads quarter-res; the XLA-side `_interleave`
        # (one inverse-s2d transpose) rebuilds full-res dx.  An in-kernel
        # interleave was tried first (stack+reshape): the server-side
        # Mosaic pass rejects the unit-dim reshape it needs
        # ("infer-vector-layout: unsupported shape cast",
        # vector<8x72x728> -> vector<8x72x1x728> on v5e, r3 wave 2).
        dt = d00_ref.dtype
        d00_ref[0] = dx00.astype(dt)
        d01_ref[0] = dx01.astype(dt)
        d10_ref[0] = dx10.astype(dt)
        d11_ref[0] = dx11.astype(dt)

        # depthwise wgrad: the nine forward taps against dd center rows
        def f32(t):
            return t.astype(jnp.float32)

        taps = (
            ((0, 0), _shift_w(he1[:th], -1)), ((0, 1), he0[:th]),
            ((0, 2), he1[:th]),
            ((1, 0), _shift_w(ho1, -1)), ((1, 1), ho0), ((1, 2), ho1),
            ((2, 0), _shift_w(he1[1:], -1)), ((2, 1), he0[1:]),
            ((2, 2), he1[1:]),
        )
        for (i, j), tap in taps:
            ddw_ref[i, j, :] += lane_sum(f32(tap) * ddc)

        # pointwise wgrad: recompute d (rounded exactly as the forward)
        acc = (
            f32(ho0) * k32[1, 1]
            + f32(ho1) * k32[1, 2]
            + f32(_shift_w(ho1, -1)) * k32[1, 0]
            + f32(he0[:th]) * k32[0, 1]
            + f32(he0[1:]) * k32[2, 1]
            + f32(he1[:th]) * k32[0, 2]
            + f32(_shift_w(he1[:th], -1)) * k32[0, 0]
            + f32(he1[1:]) * k32[2, 2]
            + f32(_shift_w(he1[1:], -1)) * k32[2, 0]
        )
        d = acc.astype(x.dtype).reshape(th * w2, c)
        dpw_ref[...] += lax.dot_general(
            d, gt[:th].reshape(th * w2, f),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    vec_spec = pl.BlockSpec((1, c), lambda ni, hi: (0, 0))
    in_specs = [
        _x_window_spec_v2(th, h, w, c),
        _g_window_spec_v2(th, h2, w2, f),
    ]
    operands = [x, g]
    if affine:
        in_specs += [vec_spec, vec_spec]
        operands += [ab[0], ab[1]]
    in_specs += [
        pl.BlockSpec((3, 3, c), lambda ni, hi: (0, 0, 0)),
        pl.BlockSpec((f, c), lambda ni, hi: (0, 0)),
    ]
    operands += [dwk, pwk_t]

    out_specs = [
        _plain_spec(th, w2, c), _plain_spec(th, w2, c),
        _plain_spec(th, w2, c), _plain_spec(th, w2, c),
        pl.BlockSpec((3, 3, c), lambda ni, hi: (0, 0, 0)),
        pl.BlockSpec((c, f), lambda ni, hi: (0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, h2, w2, c), x.dtype),
        jax.ShapeDtypeStruct((n, h2, w2, c), x.dtype),
        jax.ShapeDtypeStruct((n, h2, w2, c), x.dtype),
        jax.ShapeDtypeStruct((n, h2, w2, c), x.dtype),
        jax.ShapeDtypeStruct((3, 3, c), jnp.float32),
        jax.ShapeDtypeStruct((c, f), jnp.float32),
    ]
    if affine:
        out_specs += [vec_spec, vec_spec]
        out_shape += [
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ]

    return pl.pallas_call(
        kernel,
        grid=(n, nh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # 127 MiB: the v2 in-kernel splits cost more scoped stack than
            # the picker's estimate (block1 th=16 measured 107.8M on HW)
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_sepconv_s2_v2_impl(x, dwk, pwk, interpret: bool = False):
    return _fwd_pallas_s2v2(x, dwk, pwk, interpret=interpret)


def fused_sepconv_s2_v2(x, dwk, pwk, interpret: bool = False):
    """v2 of ``fused_sepconv_s2``: identical math (same fp32 tap order; bits
    can differ ULP-scale when the row-tile pickers choose different th),
    zero XLA-side glue.  Select with DEEPCAM_FUSED_S2=2.  H < 4 falls back
    to v1 (the 2·th+1 window needs at least two half-res rows)."""
    if x.shape[1] < 4:
        return fused_sepconv_s2(x, dwk, pwk, interpret)
    return _fused_sepconv_s2_v2_impl(x, dwk, pwk, interpret)


def _fs2v2_fwd(x, dwk, pwk, interpret):
    y = _fwd_pallas_s2v2(x, dwk, pwk, interpret=interpret)
    return y, (x, dwk, pwk)


def _fs2v2_bwd(interpret, res, g):
    x, dwk, pwk = res
    d00, d01, d10, d11, ddw, dpw = _bwd_pallas_s2v2(
        x, g.astype(x.dtype), dwk, pwk.T, interpret=interpret)
    dx = _interleave(d00, d01, d10, d11)
    return dx, ddw.astype(dwk.dtype), dpw.astype(pwk.dtype)


_fused_sepconv_s2_v2_impl.defvjp(_fs2v2_fwd, _fs2v2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_sepconv_s2_affine_v2_impl(x, a, b, dwk, pwk,
                                     interpret: bool = False):
    ab = (a.reshape(1, -1), b.reshape(1, -1))
    return _fwd_pallas_s2v2(x, dwk, pwk, ab=ab, interpret=interpret)


def fused_sepconv_s2_affine_v2(x, a, b, dwk, pwk, interpret: bool = False):
    """v2 of ``fused_sepconv_s2_affine`` (in-kernel phase split).  H < 4
    falls back to v1."""
    if x.shape[1] < 4:
        return fused_sepconv_s2_affine(x, a, b, dwk, pwk, interpret)
    return _fused_sepconv_s2_affine_v2_impl(x, a, b, dwk, pwk, interpret)


def _fs2av2_fwd(x, a, b, dwk, pwk, interpret):
    ab = (a.reshape(1, -1), b.reshape(1, -1))
    y = _fwd_pallas_s2v2(x, dwk, pwk, ab=ab, interpret=interpret)
    return y, (x, a, b, dwk, pwk)


def _fs2av2_bwd(interpret, res, g):
    x, a, b, dwk, pwk = res
    ab = (a.reshape(1, -1), b.reshape(1, -1))
    d00, d01, d10, d11, ddw, dpw, da, db = _bwd_pallas_s2v2(
        x, g.astype(x.dtype), dwk, pwk.T, ab=ab, interpret=interpret)
    dx = _interleave(d00, d01, d10, d11)
    return (dx, da[0].astype(a.dtype), db[0].astype(b.dtype),
            ddw.astype(dwk.dtype), dpw.astype(pwk.dtype))


_fused_sepconv_s2_affine_v2_impl.defvjp(_fs2av2_fwd, _fs2av2_bwd)


# ---------------------------------------------------------------------------
# phase split / merge (XLA side — transposes, never scatters)
# ---------------------------------------------------------------------------


def _phases(x):
    """(N, H, W, C) → four (N, H/2, W/2, C) phases; x10/x11 top-1-padded."""
    x00 = x[:, 0::2, 0::2, :]
    x01 = x[:, 0::2, 1::2, :]
    pad = ((0, 0), (1, 0), (0, 0), (0, 0))
    x10 = jnp.pad(x[:, 1::2, 0::2, :], pad)
    x11 = jnp.pad(x[:, 1::2, 1::2, :], pad)
    return x00, x01, x10, x11


def _interleave(d00, d01, d10, d11):
    """Four (N, H2, W2, C) phase grads → (N, 2·H2, 2·W2, C) — the inverse
    space-to-depth with the canonical (ph, pw, C) channel order."""
    from ..conv_small_ch import _s2d_inv

    return _s2d_inv(
        jnp.concatenate([d00, d01, d10, d11], axis=-1), d00.shape[-1]
    )


# ---------------------------------------------------------------------------
# custom-VJP wrappers
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_sepconv_s2(x, dwk, pwk, interpret: bool = False):
    """depthwise3x3(stride 2, 'same') → pointwise, one TPU kernel.

    x: (N, H, W, C) with even H/W; dwk: (3, 3, C); pwk: (C, F).  Returns
    (N, H/2, W/2, F) in x.dtype.  Parity target: the unfused composition
    in SeparableConv2dSame (reference ``SeparableConv2d_same`` with
    stride 2, ``deeplab_xception.py:54-66``)."""
    return _fwd_pallas_s2(*_phases(x), dwk, pwk, interpret=interpret)


def _fs2_fwd(x, dwk, pwk, interpret):
    ph = _phases(x)
    y = _fwd_pallas_s2(*ph, dwk, pwk, interpret=interpret)
    return y, (ph, dwk, pwk)


def _fs2_bwd(interpret, res, g):
    ph, dwk, pwk = res
    gp = jnp.pad(g.astype(ph[0].dtype),
                 ((0, 0), (0, 1), (0, 0), (0, 0)))
    d00, d01, d10, d11, ddw, dpw = _bwd_pallas_s2(
        *ph, gp, dwk, pwk.T, interpret=interpret)
    return (_interleave(d00, d01, d10, d11), ddw.astype(dwk.dtype),
            dpw.astype(pwk.dtype))


fused_sepconv_s2.defvjp(_fs2_fwd, _fs2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_sepconv_s2_affine(x, a, b, dwk, pwk, interpret: bool = False):
    """BN-apply-folded stride-2 sepconv: ``(x·a + b) → dw3x3/s2 → pw``.

    Parity target: ``fused_sepconv_s2(x*a + b, ...)`` with the affine as
    the same FMA BatchNorm2d(fold=True) hands to the tail unit."""
    ab = (a.reshape(1, -1), b.reshape(1, -1))
    return _fwd_pallas_s2(*_phases(x), dwk, pwk, ab=ab, interpret=interpret)


def _fs2a_fwd(x, a, b, dwk, pwk, interpret):
    ph = _phases(x)
    ab = (a.reshape(1, -1), b.reshape(1, -1))
    y = _fwd_pallas_s2(*ph, dwk, pwk, ab=ab, interpret=interpret)
    return y, (ph, a, b, dwk, pwk)


def _fs2a_bwd(interpret, res, g):
    ph, a, b, dwk, pwk = res
    ab = (a.reshape(1, -1), b.reshape(1, -1))
    gp = jnp.pad(g.astype(ph[0].dtype),
                 ((0, 0), (0, 1), (0, 0), (0, 0)))
    d00, d01, d10, d11, ddw, dpw, da, db = _bwd_pallas_s2(
        *ph, gp, dwk, pwk.T, ab=ab, interpret=interpret)
    return (_interleave(d00, d01, d10, d11), da[0].astype(a.dtype),
            db[0].astype(b.dtype), ddw.astype(dwk.dtype),
            dpw.astype(pwk.dtype))


fused_sepconv_s2_affine.defvjp(_fs2a_fwd, _fs2a_bwd)
