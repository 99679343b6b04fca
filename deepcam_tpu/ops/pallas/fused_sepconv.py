"""Pallas TPU kernel: fused [ReLU →] depthwise-3x3 → pointwise-1x1 unit.

The Xception trunk is a chain of `relu → sepconv(dw 3x3 + pw 1x1) → BN`
units (reference ``deeplab_xception.py:69-122`` rep units; executed 48x in
the middle flow at (48, 72, 728)).  Round-1 left each op to XLA: every unit
materializes the relu output, the depthwise output and the pointwise output
in HBM, and the backward re-reads the activation ~9x for the depthwise wgrad
slices (PERF.md: ~40 ms/step of copies/slices/pads on a 129 ms step).

This kernel computes the whole unit in ONE pass per (image, row-tile) grid
step — and its custom-VJP backward computes ALL of {dx, d_dw, d_pw} from one
residency of (x, g):

forward (per grid step):
    xt   = x rows [hi*th-d, hi*th+th+d)  (overlapping ``pl.Element`` row
                                          window — Pallas pipelines it)
    h    = relu(xt)                      (VPU; skipped when pre_relu=False)
    d    = sum of 9 shifted taps h*k     (VPU, fp32 acc; W shifts in-kernel
                                          as fp32 pltpu.roll sublane rotates
                                          + iota edge masks by default —
                                          DEEPCAM_FUSED_ROLL=0 restores the
                                          slice + zero-block concat form)
    y    = d @ pw                        (MXU, fp32 acc, bf16 out)

backward (per grid step):
    xt, gt = haloed x and g row windows
    h    = relu(xt);  dd = gt @ pw^T     (MXU — pointwise dgrad, fp32)
    dh   = sum of 9 shifted taps dd*flip(k)        (depthwise dgrad)
    dx   = dh * (xt > 0)                           (relu mask)
    d_dw[i,j] += sum h_tap(i,j) * dd_center        (depthwise wgrad,
                                                    accumulated across grid)
    d_pw     += d_center^T @ g_center    (MXU — pointwise wgrad, accumulated)

The cross-grid fp32 accumulation for d_dw / d_pw relies on the sequential
TPU grid with a constant output index map (same pattern as
ops/pallas/dw_wgrad.py).  Numerics match the unfused XLA path: bf16 operands
are upcast to fp32 *before* every product, accumulation is fp32, and the
depthwise output is rounded to bf16 before the pointwise matmul exactly
where the unfused path rounds it.

Mosaic constraints that shaped the design (probed on v5e, see git history
of scripts/probe_element_window.py):
* manual-DMA HBM slices need 128-aligned lane extents → C=728 can't be
  manually DMA'd without host channel padding;
* element-window *padding* is unsupported (low) and sublane starts must be
  8-aligned → the row halo comes from a host-side H pad of (d, d) (an XLA
  pad the compiler fuses into the producer; the padded array is also the
  saved residual, so the backward re-uses it) and the W halo is built
  in-kernel (slice + zero-block concat);
* with in-bounds element starts and no window padding, the same code path
  runs under interpret mode on CPU (used by tests/test_fused_sepconv.py).

Supported: stride 1, dilation d (halo d), any C/F (lane padding is left to
Mosaic — no host-side channel pad).  Stride-2 sepconvs (3 in the model)
stay on the XLA path.

``fused_sepconv_affine`` additionally folds the PRECEDING BatchNorm's apply
(``u = x*a + b`` with per-channel a/b) into the same kernel — the rep-unit
chain ``... → BN → relu → sepconv → ...`` (reference
``deeplab_xception.py:79-108`` + the trailing BN at :100) then never
materializes the BN output in HBM: the forward applies the affine in-kernel
and the backward emits {dz, da, db} alongside {ddw, dpw} from the same
residency.  The BN *statistics* (reductions over the producer) and their
gradient path stay in XLA — only the apply/mask elementwise traffic moves
into the kernel, so autodiff of mean/var remains exact by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vmem_limit() -> int:
    """Scoped-VMEM limit handed to Mosaic (DEEPCAM_FUSED_VMEM_LIMIT_MB,
    default 100).  v5e has 128 MiB of VMEM; raising the limit lets bigger
    row tiles (DEEPCAM_FUSED_TH > 16) compile for A/B study."""
    import os

    return int(os.environ.get("DEEPCAM_FUSED_VMEM_LIMIT_MB", "100")) << 20


def _pick_row_tile(h: int, w: int, c: int, f: int, d: int) -> int:
    """Rows per grid step: the largest divisor of h whose estimated
    backward working set fits the VMEM budget.

    Bigger tiles measurably win up to 16 rows (whole-model sweep, PERF.md
    r2: th=8 131 ms, th=16 117.9 ms — fewer grid steps, fewer weight/
    accumulator refetches), but 24+-row tiles compile-fail or lose (96 MB
    budget → Mosaic OOM).  Defaults reproduce the measured winner: cap 16
    (DEEPCAM_FUSED_TH), 96 MB estimate budget (DEEPCAM_FUSED_VMEM_MB) that
    only reins in pathological shapes."""
    import os

    cap = int(os.environ.get("DEEPCAM_FUSED_TH", "16"))
    if h >= 96:
        # entry-flow shapes (block1/2/3 run at h 384/192/96; middle/exit
        # at 48): the r4 audit places their backwards at 10-25% of
        # roofline, so their tile cap is separately tunable
        # (DEEPCAM_FUSED_TH_ENTRY) without risking the middle-flow
        # th=24 Mosaic-OOM (r2)
        cap = int(os.environ.get("DEEPCAM_FUSED_TH_ENTRY", str(cap)))
    budget = int(os.environ.get("DEEPCAM_FUSED_VMEM_MB", "96")) << 20

    def est_bytes(t: int) -> int:
        thh = t + 2 * d
        cl = -(-c // 128) * 128  # lane-padded
        fl = -(-f // 128) * 128
        f32, bf16 = 4, 2
        return (
            f32 * thh * w * cl          # dd (pointwise dgrad)
            + f32 * t * w * cl          # dh accumulator
            + f32 * t * w * max(cl, fl)  # live tap temporary
            + f32 * t * w * cl          # recomputed dw32
            + bf16 * 2 * thh * w * (cl + fl)  # xs, gs double-buffered
            + f32 * cl * fl + bf16 * cl * fl  # dpw acc + pw^T
            + bf16 * 2 * t * w * cl     # dx out double-buffered
        )

    best = 1
    for t in range(1, min(cap, h) + 1):
        if h % t == 0 and est_bytes(t) <= budget:
            best = t
    return best


def _shift_w(t, o):
    """out[:, w] = t[:, w+o], zero-filled where w+o is out of range.

    Default (``DEEPCAM_FUSED_ROLL=1``, r4 wave-13 A/B/A: 25.29/25.34 vs
    controls 25.06/25.16/25.14 — every roll reading above every control):
    the shift is a sublane rotate (``pltpu.roll``) + iota edge mask — a
    register-level sublane permute.  ``=0`` restores the two-piece
    zero-block concat, which materializes a fresh (th, W, C) buffer per
    tap."""
    if o == 0:
        return t
    import os
    if os.environ.get("DEEPCAM_FUSED_ROLL", "1") == "1":
        # server-side Mosaic: "Rotate with non-32-bit data" not
        # implemented — rotate in fp32 (every call site casts the
        # shifted tap to fp32 immediately anyway)
        t32 = t.astype(jnp.float32)
        r = pltpu.roll(t32, (-o) % t.shape[1], 1)  # roll wants shift >= 0
        idx = lax.broadcasted_iota(jnp.int32, (1, t.shape[1], 1), 1)
        valid = (idx < t.shape[1] - o) if o > 0 else (idx >= -o)
        return jnp.where(valid, r, jnp.zeros((), jnp.float32))
    z = jnp.zeros((t.shape[0], abs(o), t.shape[2]), t.dtype)
    if o > 0:
        return jnp.concatenate([t[:, o:, :], z], axis=1)
    return jnp.concatenate([z, t[:, :o, :]], axis=1)


def _dw_from_halo(ht, k, *, th, d, flip=False, w_out=None):
    """Depthwise 3x3 over the row-haloed tile ``ht`` (th+2d, W, C):
    out[r, w, c] = sum_ij ht[r + i*d, w + (j-1)*d, c] * k[i, j, c] with
    zero W edges; fp32 accumulation; ``flip`` uses k[2-i, 2-j] (dgrad).

    With ``w_out`` the tile is W-haloed too ((th+2d, w_out+2d, C), zero
    pad cols in the operand) and every tap is a pure 2D slice — no
    zero-block concat (``_shift_w``) on the VPU."""
    acc = None
    k32 = k.astype(jnp.float32)
    for i in range(3):
        rows = ht[i * d:i * d + th, :, :]
        for j in range(3):
            if w_out is not None:
                tap = rows[:, j * d:j * d + w_out, :].astype(jnp.float32)
            else:
                tap = _shift_w(rows, (j - 1) * d).astype(jnp.float32)
            kij = k32[2 - i, 2 - j] if flip else k32[i, j]
            term = tap * kij
            acc = term if acc is None else acc + term
    return acc


def _zero_pad_rows(ht, hi, *, th, d, h, wpad=False):
    """Zero the rows of a haloed tile ``ht`` (th+2d, W, C) that fall on the
    out-of-bounds H pad of the operand (global padded-row index < d or
    >= d + h).  Needed when an affine is folded in-kernel: the pad rows are
    stored as zeros, but 0*a + b ≠ 0.  With ``wpad`` the tile is W-haloed
    too and the (static) first/last d pad columns are zeroed as well."""
    r = lax.broadcasted_iota(jnp.int32, (ht.shape[0], 1, 1), 0) + hi * th
    valid = jnp.logical_and(r >= d, r < d + h)
    if wpad:
        cidx = lax.broadcasted_iota(jnp.int32, (1, ht.shape[1], 1), 1)
        cvalid = jnp.logical_and(cidx >= d, cidx < ht.shape[1] - d)
        valid = jnp.logical_and(valid, cvalid)
    return jnp.where(valid, ht, jnp.zeros((), ht.dtype))


def _halo_spec(th, d, w, c):
    """Overlapping row window (1, th+2d, w, c) starting at row hi*th of the
    H-padded operand — all starts in-bounds, no window padding.  ``w`` is
    the operand's full W extent (w or w+2d in wpad mode)."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(th + 2 * d), pl.Element(w),
         pl.Element(c)),
        lambda ni, hi: (ni, hi * th, 0, 0),
    )


def _halo_spec_nopad(th, d, h, w, c):
    """Overlapping row window over the UNPADDED operand (N, H, W, C): the
    ideal start hi*th − d is clamped into bounds, so the first/last tiles'
    windows are shifted by ±d — ``_fix_window`` undoes the shift in-kernel
    (with zero fill for the out-of-range halo rows).  Removes the host-side
    H-pad entirely: the pad materialized a full copy of every operand
    because the consuming custom-call can't fuse it (~10 ms/step of ``pad``
    ops in the r2 batch-4 trace)."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(th + 2 * d), pl.Element(w),
         pl.Element(c)),
        lambda ni, hi: (ni, jnp.clip(hi * th - d, 0, h - th - 2 * d), 0, 0),
    )


def _fix_window(ht, hi, nh, d):
    """Undo the clamped-window shift: for the first tile the window starts
    d rows late (L[r] = W[r−d], top halo zero), for the last tile d rows
    early (L[r] = W[r+d], bottom halo zero); middle tiles are exact.  Two
    whole-window selects on VMEM-resident data — far cheaper than the HBM
    pad round-trip they replace."""
    if d == 0 or nh == 1:
        return ht
    z = jnp.zeros_like(ht[:d])
    down = jnp.concatenate([z, ht[:-d]], axis=0)
    up = jnp.concatenate([ht[d:], z], axis=0)
    return jnp.where(hi == 0, down, jnp.where(hi == nh - 1, up, ht))


def _use_nopad() -> bool:
    """Unpadded operands with clamped windows — default ON (measured
    whole-model win on v5e: 22.73 -> 23.11 samples/s/chip, r2 A/B queue);
    DEEPCAM_FUSED_NOPAD=0 opts out.  CPU-interpret parity is covered by
    tests/test_fused_sepconv.py::TestNopadWindows."""
    import os

    return os.environ.get("DEEPCAM_FUSED_NOPAD", "1") == "1"


def _nopad_ok(h, w, c, f, d) -> bool:
    """Clamped windows need the window to fit the unpadded extent."""
    if _use_wpad() or not _use_nopad():
        return False
    th = _pick_row_tile(h, w, c, f, d)
    return h - th - 2 * d >= 0


def _emit_d(h: int) -> bool:
    """DEEPCAM_FUSED_EMIT_D=N: units with H ≥ N emit the bf16-rounded
    depthwise output from the FORWARD kernel so the backward reads it
    instead of recomputing it with a 9-tap loop (kills loop C).  The
    trade was EXPECTED to favor only the entry shapes (one HBM
    round-trip of the d tensor vs 9 full-tile VMEM passes per grid
    step), but the measurements inverted the middle-flow prediction:
    N=96 (blocks 1–3) measured 24.39/24.21 vs 24.22/24.21 controls and
    N=48 (every fused unit) measured 24.66/24.53/24.14 — consistently
    above every non-48 reading across three paired sessions (r4 waves
    6–8).  Default 48; DEEPCAM_FUSED_EMIT_D=0 opts out."""
    import os

    v = os.environ.get("DEEPCAM_FUSED_EMIT_D", "48")
    return v.isdigit() and v != "0" and h >= int(v)


def _dd16() -> str:
    """Backward pointwise-dgrad (dd) precision for the tap loops:
    ``"0"`` (default) fp32; ``"1"`` cast to the compute dtype after the
    matmul (r4: 0.994x — the cast pass cost more than the read saving);
    (``"direct"`` — emitting bf16 straight from the matmul's
    preferred_element_type — is a documented WALL: Mosaic verifies
    'tpu.matmul acc must be 32-bit', r5 probe; it lowers as the =1 cast
    form.)  Not a precision loss vs the PARITY target either way: the
    unfused XLA path's pointwise-dgrad conv emits bf16 and its depthwise
    dgrad/wgrad convs consume that."""
    import os

    return os.environ.get("DEEPCAM_FUSED_DD16", "0")


def _fuse_tap_loops() -> bool:
    """Merge the backward's d_dw tap loop with the dw-output recompute
    (identical tap loads, each materialized once instead of twice) —
    opt-in DEEPCAM_FUSED_TAPS1=1 pending the whole-model A/B (kept OFF by
    default so the in-flight wave-3 arms stay comparable to their
    control)."""
    import os

    return os.environ.get("DEEPCAM_FUSED_TAPS1", "0") == "1"


def _csplit(c: int, h: int) -> int:
    """Number of channel (lane-dim) chunks for the BACKWARD tap loops —
    the r4 closing audit's c-minor-split probe (round5_plan P1): the fp32
    tap loops A (dgrad) and B (dw wgrad) are VMEM-traffic/live-range
    bound at the entry shapes; processing the channel dim in chunks cuts
    the live set per unrolled tap expression so Mosaic can keep
    accumulator tiles register-resident across taps.  Opt-in
    ``DEEPCAM_FUSED_CSPLIT=N`` (N chunks, must divide C), applied at
    units with H ≥ ``DEEPCAM_FUSED_CSPLIT_MINH`` (default 96 — the entry
    blocks) and C ≤ ``DEEPCAM_FUSED_CSPLIT_MAXC`` (default 128: the r5
    server probe compiles+runs the split form at every c ≤ 128 entry
    shape but the remote tpu_compile_helper CRASHES (HTTP 500) at
    c ≥ 256 — analysis/r5_queue/csplit_probe.log); 0/1 = off."""
    import os

    v = os.environ.get("DEEPCAM_FUSED_CSPLIT", "0")
    n = int(v) if v.isdigit() else 0
    minh = int(os.environ.get("DEEPCAM_FUSED_CSPLIT_MINH", "96"))
    maxc = int(os.environ.get("DEEPCAM_FUSED_CSPLIT_MAXC", "128"))
    if n <= 1 or h < minh or c > maxc or c % n != 0 or _use_wpad():
        return 1
    return n


def _use_wpad() -> bool:
    """W-halo in the operand (pad W like H): every in-kernel tap becomes a
    pure 2D slice instead of a zero-block-concat W shift.  Measured r2 on
    v5e: the (w+2d) window extent breaks the 8-sublane alignment of every
    windowed read and the backward REGRESSES 9.04 → 13.62 ms on the
    24-unit chain — opt-in (DEEPCAM_FUSED_WPAD=1) for study only."""
    import os

    return os.environ.get("DEEPCAM_FUSED_WPAD", "0") == "1"


def _pad_h(x, d):
    if _use_wpad():
        return jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    return jnp.pad(x, ((0, 0), (d, d), (0, 0), (0, 0)))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_pallas(xp, dwk, pwk, *, pre_relu: bool, dilation: int,
                interpret: bool = False, ab=None, emit_stats: bool = False,
                padded: bool = True, skip=None, emit_d: bool = False):
    """xp is the H-padded input (N, H+2d, W, C).  ``ab`` (optional) is a
    pair of (1, C) per-channel scale/offset applied in-kernel BEFORE the
    relu — the folded BN-apply of the preceding BatchNorm.

    With ``emit_stats`` the kernel additionally emits per-grid-step partial
    Σy and Σy² of the ROUNDED output (fp32, shapes (N, nh, F)) from the
    tile already in VMEM — the consuming BatchNorm then never re-reads the
    output for its statistics (PERF.md r2: the separate stats passes cost
    ~5.6 ms/step).  Sums are of the bf16-rounded y, exactly what the
    separate stats pass would read.

    ``skip`` (optional, requires ``ab`` and ``pre_relu``) is a residual
    operand read through the same haloed window as x: the kernel computes
    ``r = relu(x*a + b + skip)`` — the middle-flow BLOCK-BOUNDARY chain
    (chain-final BN-apply + residual add + next block's leading ReLU,
    reference ``Block.forward`` add at deeplab_xception.py:111-121 plus
    the inplace-ReLU aliasing) — consumes r for its own taps AND emits r
    as a second output (the residual stream the next block's skip path
    reads), so the XLA boundary pass never materializes."""
    n, hp, w_op, c = xp.shape
    f = pwk.shape[-1]
    d = dilation
    h = hp - 2 * d if padded else hp
    wpad = _use_wpad()
    w = w_op - 2 * d if wpad else w_op
    th = _pick_row_tile(h, w, c, f, d)
    nh = h // th
    affine = ab is not None
    with_skip = skip is not None
    assert not with_skip or (affine and pre_relu and not wpad)
    # forward tap-loop c-split: opt-in on top of the bwd gate
    # (DEEPCAM_FUSED_CSPLIT_FWD=1)
    import os as _os

    ncs_f = (_csplit(c, h)
             if _os.environ.get("DEEPCAM_FUSED_CSPLIT_FWD", "0") == "1"
             and not wpad else 1)

    def kernel(*refs):
        idx = 1
        x_ref = refs[0]
        s_ref = None
        if with_skip:
            s_ref = refs[idx]
            idx += 1
        if affine:
            a_ref, b_ref = refs[idx:idx + 2]
            idx += 2
        dwk_ref, pwk_ref = refs[idx:idx + 2]
        outs = refs[idx + 2:]
        out_ref = outs[0]
        ht = x_ref[0]
        if not padded:
            ht = _fix_window(ht, pl.program_id(1), nh, d)
        if affine:
            # bf16 FMA — the exact expression BatchNorm2d.apply computes
            ht = ht * a_ref[0] + b_ref[0]
        if with_skip:
            st = s_ref[0]
            if not padded:
                st = _fix_window(st, pl.program_id(1), nh, d)
            ht = ht + st
        if pre_relu:
            ht = jnp.maximum(ht, 0)
        if affine:
            # the halo pad rows/cols are zeros in xp; the depthwise 'same'
            # pad must be zero AFTER the affine (+relu), not relu(0*a + b)
            ht = _zero_pad_rows(ht, pl.program_id(1), th=th, d=d, h=h,
                                wpad=wpad)
        if with_skip:
            # r = relu(u) center rows — the residual stream for the next
            # block's skip path (halo rows belong to neighbor tiles)
            outs[-1][0] = ht[d:d + th].astype(outs[-1].dtype)
        if ncs_f > 1:
            # c-minor split of the forward tap loop (DEEPCAM_FUSED_CSPLIT
            # + _FWD=1): chunk-major over lanes, like the backward
            csz = c // ncs_f
            kk = dwk_ref[...]
            dw32 = jnp.concatenate([
                _dw_from_halo(ht[:, :, ci * csz:(ci + 1) * csz],
                              kk[:, :, ci * csz:(ci + 1) * csz],
                              th=th, d=d)
                for ci in range(ncs_f)], axis=-1)
        else:
            dw32 = _dw_from_halo(ht, dwk_ref[...], th=th, d=d,
                                 w_out=w if wpad else None)
        db = dw32.astype(xp.dtype).reshape(th * w, c)
        if emit_d:
            # the bf16-rounded depthwise output, for the backward's
            # pointwise wgrad (see _emit_d) — exactly the value the
            # backward would otherwise recompute with 9 tap passes
            outs[2 if emit_stats else 1][0] = db.reshape(th, w, c)
        y = jnp.dot(db, pwk_ref[...], preferred_element_type=jnp.float32)
        yr = y.astype(out_ref.dtype)
        out_ref[0] = yr.reshape(th, w, f)
        if emit_stats:
            # rows: [Σy, Σy²] over the WHOLE tensor — one (2, F) fp32
            # accumulator with a constant index map, accumulated across the
            # sequential grid like d_dw/d_pw in the backward (Mosaic needs
            # the block's sublane dim to equal the array dim, hence the
            # stacked pair instead of two (1, F) outputs).  Per-channel
            # stats also make the VJP's stats cotangent per-channel — the
            # exact shape the in-kernel backward adjustment needs.
            @pl.when(jnp.logical_and(pl.program_id(0) == 0,
                                     pl.program_id(1) == 0))
            def _():
                outs[1][...] = jnp.zeros_like(outs[1])

            y32 = yr.astype(jnp.float32)
            outs[1][...] += jnp.stack(
                [jnp.sum(y32, axis=0), jnp.sum(y32 * y32, axis=0)]
            )

    vec_spec = pl.BlockSpec((1, c), lambda ni, hi: (0, 0))
    x_spec = (_halo_spec(th, d, w_op, c) if padded
              else _halo_spec_nopad(th, d, h, w_op, c))
    in_specs = [x_spec]
    operands = [xp]
    if with_skip:
        in_specs += [x_spec]
        operands += [skip]
    if affine:
        in_specs += [vec_spec, vec_spec]
        operands += [ab[0], ab[1]]
    in_specs += [
        pl.BlockSpec((3, 3, c), lambda ni, hi: (0, 0, 0)),
        pl.BlockSpec((c, f), lambda ni, hi: (0, 0)),
    ]
    operands += [dwk, pwk]

    out_specs = pl.BlockSpec((1, th, w, f), lambda ni, hi: (ni, hi, 0, 0))
    out_shape = jax.ShapeDtypeStruct((n, h, w, f), xp.dtype)
    if emit_stats or with_skip or emit_d:
        out_specs = [out_specs]
        out_shape = [out_shape]
    if emit_stats:
        out_specs += [pl.BlockSpec((2, f), lambda ni, hi: (0, 0))]
        out_shape += [jax.ShapeDtypeStruct((2, f), jnp.float32)]
    if emit_d:
        out_specs += [pl.BlockSpec((1, th, w, c),
                                   lambda ni, hi: (ni, hi, 0, 0))]
        out_shape += [jax.ShapeDtypeStruct((n, h, w, c), xp.dtype)]
    if with_skip:
        out_specs += [pl.BlockSpec((1, th, w, c),
                                   lambda ni, hi: (ni, hi, 0, 0))]
        out_shape += [jax.ShapeDtypeStruct((n, h, w, c), xp.dtype)]

    return pl.pallas_call(
        kernel,
        grid=(n, nh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
        ),
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_pallas(xp, gp, dwk, pwk_t, *, pre_relu: bool, dilation: int,
                interpret: bool = False, ab=None, padded: bool = True,
                stats=None, skip=None, gr=None, demit=None):
    """xp, gp are H-padded (N, H+2d, W, C/F).  Returns (dx (N,H,W,C) in
    x.dtype, d_dw (3,3,C) fp32, d_pw (C,F) fp32) — plus (da, db) (1, C)
    fp32 when ``ab`` is given (folded BN-apply: u = x*a + b feeds the
    relu; dx then carries du*a and da/db accumulate Σdu·x / Σdu across the
    grid exactly like d_dw/d_pw).  ``pwk_t`` is the transposed pointwise
    kernel (F, C).

    ``stats=(gs, y)`` (requires ``padded=False``) folds the per-channel
    stats cotangent into gt IN-KERNEL: gs is the stacked (2, F) fp32
    [gs1, gs2] pair and y the (unpadded) forward output — each tile reads
    its own y window and computes ``gt += gs1 + 2·y·gs2`` (rounded to
    gt's dtype, matching the XLA-side ``_stats_adjust``), replacing the
    separate three-pass XLA adjust (~5 ms/step across the model, r2)."""
    n, hp, w_op, c = xp.shape
    f = pwk_t.shape[0]
    d = dilation
    h = hp - 2 * d if padded else hp
    wpad = _use_wpad()
    w = w_op - 2 * d if wpad else w_op
    th = _pick_row_tile(h, w, c, f, d)
    nh = h // th
    thh = th + 2 * d
    affine = ab is not None
    with_stats = stats is not None
    with_skip = skip is not None
    with_demit = demit is not None
    assert not (with_stats and padded)
    assert not with_skip or (affine and pre_relu and not wpad
                             and gr is not None and not with_stats)
    assert not (with_demit and wpad)
    ncs = _csplit(c, h)

    def kernel(*refs):
        idx = 2
        x_ref, g_ref = refs[:2]
        s_ref = gr_ref = d_ref = None
        if with_demit:
            d_ref = refs[idx]
            idx += 1
        if with_skip:
            s_ref, gr_ref = refs[idx:idx + 2]
            idx += 2
        if with_stats:
            y_ref, gs_ref = refs[idx:idx + 2]
            idx += 2
        if affine:
            a_ref, b_ref = refs[idx:idx + 2]
            idx += 2
        dwk_ref, pwt_ref = refs[idx:idx + 2]
        outs = refs[idx + 2:]
        if with_skip:
            dx_ref, ddw_ref, dpw_ref, da_ref, db_ref, dsk_ref = outs
        elif affine:
            dx_ref, ddw_ref, dpw_ref, da_ref, db_ref = outs
        else:
            dx_ref, ddw_ref, dpw_ref = outs
        ni = pl.program_id(0)
        hi = pl.program_id(1)
        xt = x_ref[0]
        gt = g_ref[0]
        if not padded:
            xt = _fix_window(xt, hi, nh, d)
            gt = _fix_window(gt, hi, nh, d)
        if with_stats:
            yt = _fix_window(y_ref[0], hi, nh, d)
            adj = gs_ref[0] + 2.0 * yt.astype(jnp.float32) * gs_ref[1]
            # rows outside the image carry no cotangent
            adj = _zero_pad_rows(adj, hi, th=th, d=d, h=h, wpad=wpad)
            gt = (gt.astype(jnp.float32) + adj).astype(g_ref.dtype)

        @pl.when(jnp.logical_and(ni == 0, hi == 0))
        def _():
            ddw_ref[...] = jnp.zeros_like(ddw_ref)
            dpw_ref[...] = jnp.zeros_like(dpw_ref)
            if affine:
                da_ref[...] = jnp.zeros_like(da_ref)
                db_ref[...] = jnp.zeros_like(db_ref)

        ut = xt * a_ref[0] + b_ref[0] if affine else xt
        if with_skip:
            st = s_ref[0]
            if not padded:
                st = _fix_window(st, hi, nh, d)
            ut = ut + st
        ht = jnp.maximum(ut, 0) if pre_relu else ut
        if affine:
            # zero the halo pad rows/cols post-affine (see forward kernel)
            ht = _zero_pad_rows(ht, hi, th=th, d=d, h=h, wpad=wpad)

        # pointwise dgrad over the haloed rows (zero g halo → zero dd halo)
        dd_mode = _dd16()
        dd = jnp.dot(
            gt.reshape(thh * w_op, f), pwt_ref[...],
            preferred_element_type=jnp.float32,
        ).reshape(thh, w_op, c)
        if dd_mode in ("1", "direct"):
            # round the pointwise dgrad to the compute dtype before the
            # tap loops — EXACTLY the unfused path's precision (its
            # pointwise-dgrad conv emits bf16, which the depthwise dgrad
            # and wgrad convs then consume); halves the tap loops' dd
            # read traffic.  Products still upcast to fp32 per-term.
            # (=direct emits the compute dtype straight from the matmul
            # epilogue instead — no separate cast pass.)
            dd = dd.astype(xp.dtype)

        # depthwise dgrad: flipped-kernel taps of dd — chunk-major over
        # the lane dim under CSPLIT (see _csplit): each chunk's 9-tap
        # accumulator lives alone, then the chunks concat back
        if ncs > 1:
            csz = c // ncs
            kk = dwk_ref[...]
            dh = jnp.concatenate([
                _dw_from_halo(dd[:, :, ci * csz:(ci + 1) * csz],
                              kk[:, :, ci * csz:(ci + 1) * csz],
                              th=th, d=d, flip=True)
                for ci in range(ncs)], axis=-1)
        else:
            dh = _dw_from_halo(dd, dwk_ref[...], th=th, d=d, flip=True,
                               w_out=w if wpad else None)
        if with_skip:
            # the r output's external cotangent joins the in-kernel tap
            # contribution BEFORE the relu mask: d_r_total = taps + gr
            dh = dh + gr_ref[0].astype(jnp.float32)
        if pre_relu:
            # fp32 compare: Mosaic can't lower a bf16 cmpf at this layout
            uc = ut[d:d + th, d:d + w, :] if wpad else ut[d:d + th, :, :]
            dh = jnp.where(uc.astype(jnp.float32) > 0, dh, 0.0)
        if with_skip:
            # d_skip = du (the residual add is an identity fan-in)
            dsk_ref[0] = dh.astype(dsk_ref.dtype)
        if affine:
            # dh is now du (grad at the affine output)
            xc = xt[d:d + th, d:d + w, :] if wpad else xt[d:d + th, :, :]
            xc32 = xc.astype(jnp.float32)
            da_ref[...] += jnp.sum(dh * xc32, axis=(0, 1))[None, :]
            db_ref[...] += jnp.sum(dh, axis=(0, 1))[None, :]
            dh = dh * a_ref[0].astype(jnp.float32)
        dx_ref[0] = dh.astype(dx_ref.dtype)

        # depthwise wgrad (9 taps of h against the center dd rows) and the
        # dw-output recompute for the pointwise wgrad share IDENTICAL tap
        # loads — one merged loop materializes each tap once instead of
        # twice (DEEPCAM_FUSED_TAPS1=0 restores the split loops for A/B;
        # accumulation order of both outputs is unchanged either way)
        if wpad:
            ddc = dd[d:d + th, d:d + w, :]
        else:
            ddc = dd[d:d + th, :, :]
        if with_demit or not _fuse_tap_loops():
            if ncs > 1:
                # chunk-major dw wgrad: all 9 taps of one lane chunk
                # before moving on (accumulators stay hot), single
                # full-width ref update per tap position
                csz = c // ncs
                parts = [[[] for _ in range(3)] for _ in range(3)]
                for ci in range(ncs):
                    sl = slice(ci * csz, (ci + 1) * csz)
                    ddcs = ddc[:, :, sl]
                    for i in range(3):
                        rows = ht[i * d:i * d + th, :, sl]
                        for j in range(3):
                            tap = _shift_w(
                                rows, (j - 1) * d).astype(jnp.float32)
                            parts[i][j].append(
                                jnp.sum(tap * ddcs, axis=(0, 1)))
                for i in range(3):
                    for j in range(3):
                        ddw_ref[i, j, :] += jnp.concatenate(parts[i][j])
            else:
                for i in range(3):
                    rows = ht[i * d:i * d + th, :, :]
                    for j in range(3):
                        if wpad:
                            tap = rows[:, j * d:j * d + w, :].astype(
                                jnp.float32)
                        else:
                            tap = _shift_w(
                                rows, (j - 1) * d).astype(jnp.float32)
                        ddw_ref[i, j, :] += jnp.sum(tap * ddc, axis=(0, 1))
            if with_demit:
                # the forward emitted the rounded depthwise output — read
                # its center-window tile instead of the 9-tap recompute
                dw32 = None
                db = d_ref[0].reshape(th * w, c)
            else:
                # pointwise wgrad: recompute d (rounded to bf16 as fwd)
                dw32 = _dw_from_halo(ht, dwk_ref[...], th=th, d=d,
                                     w_out=w if wpad else None)
        else:
            k32 = dwk_ref[...].astype(jnp.float32)
            dw32 = None
            for i in range(3):
                rows = ht[i * d:i * d + th, :, :]
                for j in range(3):
                    if wpad:
                        tap = rows[:, j * d:j * d + w, :].astype(jnp.float32)
                    else:
                        tap = _shift_w(rows, (j - 1) * d).astype(jnp.float32)
                    ddw_ref[i, j, :] += jnp.sum(tap * ddc, axis=(0, 1))
                    term = tap * k32[i, j]
                    dw32 = term if dw32 is None else dw32 + term
        if dw32 is not None:
            db = dw32.astype(xp.dtype).reshape(th * w, c)
        gc = gt[d:d + th, d:d + w, :] if wpad else gt[d:d + th, :, :]
        dpw_ref[...] += lax.dot_general(
            db, gc.reshape(th * w, f),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    vec_spec = pl.BlockSpec((1, c), lambda ni, hi: (0, 0))
    if padded:
        in_specs = [_halo_spec(th, d, w_op, c), _halo_spec(th, d, w_op, f)]
    else:
        in_specs = [_halo_spec_nopad(th, d, h, w_op, c),
                    _halo_spec_nopad(th, d, h, w_op, f)]
    operands = [xp, gp]
    if with_demit:
        in_specs += [pl.BlockSpec((1, th, w, c),
                                  lambda ni, hi: (ni, hi, 0, 0))]
        operands += [demit]
    if with_skip:
        in_specs += [in_specs[0],
                     pl.BlockSpec((1, th, w, c),
                                  lambda ni, hi: (ni, hi, 0, 0))]
        operands += [skip, gr]
    if with_stats:
        gs, y = stats
        in_specs += [_halo_spec_nopad(th, d, h, w_op, f),
                     pl.BlockSpec((2, f), lambda ni, hi: (0, 0))]
        operands += [y, gs]
    if affine:
        in_specs += [vec_spec, vec_spec]
        operands += [ab[0], ab[1]]
    in_specs += [
        pl.BlockSpec((3, 3, c), lambda ni, hi: (0, 0, 0)),
        pl.BlockSpec((f, c), lambda ni, hi: (0, 0)),
    ]
    operands += [dwk, pwk_t]

    out_specs = [
        pl.BlockSpec((1, th, w, c), lambda ni, hi: (ni, hi, 0, 0)),
        pl.BlockSpec((3, 3, c), lambda ni, hi: (0, 0, 0)),
        pl.BlockSpec((c, f), lambda ni, hi: (0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, h, w, c), xp.dtype),
        jax.ShapeDtypeStruct((3, 3, c), jnp.float32),
        jax.ShapeDtypeStruct((c, f), jnp.float32),
    ]
    if affine:
        out_specs += [vec_spec, vec_spec]
        out_shape += [
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ]
    if with_skip:
        out_specs += [pl.BlockSpec((1, th, w, c),
                                   lambda ni, hi: (ni, hi, 0, 0))]
        out_shape += [jax.ShapeDtypeStruct((n, h, w, c), xp.dtype)]

    return pl.pallas_call(
        kernel,
        grid=(n, nh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
        ),
        interpret=interpret,
    )(*operands)



def _prep_in(x, f, d):
    """Forward/backward operand prep: (operand, padded flag) — unpadded
    with clamped windows when eligible (see ``_nopad_ok``), else the
    H-padded form."""
    n, h, w, c = x.shape
    if _nopad_ok(h, w, c, f, d):
        return x, False
    return _pad_h(x, d), True


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_sepconv(x, dwk, pwk, pre_relu: bool = True, dilation: int = 1,
                  interpret: bool = False):
    """[relu →] depthwise3x3('same', dilation) → pointwise, one TPU kernel.

    x: (N, H, W, C); dwk: (3, 3, C); pwk: (C, F).  Returns (N, H, W, F) in
    x.dtype.  Parity target: the composition
    ``conv1x1(depthwise3x3(relu(x), 'same'), pw)`` of ops/depthwise.py +
    lax conv (reference semantics: ``SeparableConv2d_same``,
    deeplab_xception.py:54-66, preceded by the rep ReLU at :79).
    """
    op, padded = _prep_in(x, pwk.shape[-1], dilation)
    return _fwd_pallas(op, dwk, pwk, pre_relu=pre_relu,
                       dilation=dilation, interpret=interpret,
                       padded=padded)


def _fs_fwd(x, dwk, pwk, pre_relu, dilation, interpret):
    # save the kernel operand as the residual: the backward consumes it
    # directly (and in padded mode XLA dedups it with the forward's pad)
    xp, padded = _prep_in(x, pwk.shape[-1], dilation)
    ed = _emit_d(x.shape[1])
    out = _fwd_pallas(xp, dwk, pwk, pre_relu=pre_relu, dilation=dilation,
                      interpret=interpret, padded=padded, emit_d=ed)
    y, dem = out if ed else (out, None)
    return y, (xp, dwk, pwk, dem)


def _fs_bwd(pre_relu, dilation, interpret, res, g):
    xp, dwk, pwk, dem = res
    padded = xp.shape[1] != g.shape[1]
    gop = g.astype(xp.dtype)
    if padded:
        gop = _pad_h(gop, dilation)
    dx, ddw, dpw = _bwd_pallas(
        xp, gop, dwk, pwk.T,
        pre_relu=pre_relu, dilation=dilation, interpret=interpret,
        padded=padded, demit=dem,
    )
    return dx, ddw.astype(dwk.dtype), dpw.astype(pwk.dtype)


fused_sepconv.defvjp(_fs_fwd, _fs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_sepconv_affine(x, a, b, dwk, pwk, pre_relu: bool = True,
                         dilation: int = 1, interpret: bool = False):
    """BN-apply-folded sepconv unit: ``[relu(] x*a + b [)] → dw3x3 → pw``.

    x: (N, H, W, C); a, b: (C,) per-channel scale/offset in x.dtype (the
    preceding BatchNorm2d's apply coefficients); dwk: (3, 3, C);
    pwk: (C, F).  Numerics parity target: ``fused_sepconv(x*a + b, ...)``
    with the affine computed as the same bf16 FMA BatchNorm2d uses
    (reference semantics: the BN at the end of one rep unit feeding the
    ReLU that opens the next, ``deeplab_xception.py:79-108``).
    """
    op, padded = _prep_in(x, pwk.shape[-1], dilation)
    return _fwd_pallas(
        op, dwk, pwk, pre_relu=pre_relu, dilation=dilation,
        interpret=interpret, ab=(a.reshape(1, -1), b.reshape(1, -1)),
        padded=padded,
    )


def _fsa_fwd(x, a, b, dwk, pwk, pre_relu, dilation, interpret):
    xp, padded = _prep_in(x, pwk.shape[-1], dilation)
    ed = _emit_d(x.shape[1])
    out = _fwd_pallas(xp, dwk, pwk, pre_relu=pre_relu, dilation=dilation,
                      interpret=interpret,
                      ab=(a.reshape(1, -1), b.reshape(1, -1)),
                      padded=padded, emit_d=ed)
    y, dem = out if ed else (out, None)
    return y, (xp, a, b, dwk, pwk, dem)


def _fsa_bwd(pre_relu, dilation, interpret, res, g):
    xp, a, b, dwk, pwk, dem = res
    padded = xp.shape[1] != g.shape[1]
    gop = g.astype(xp.dtype)
    if padded:
        gop = _pad_h(gop, dilation)
    dx, ddw, dpw, da, db = _bwd_pallas(
        xp, gop, dwk, pwk.T,
        pre_relu=pre_relu, dilation=dilation, interpret=interpret,
        ab=(a.reshape(1, -1), b.reshape(1, -1)), padded=padded, demit=dem,
    )
    return (dx, da[0].astype(a.dtype), db[0].astype(b.dtype),
            ddw.astype(dwk.dtype), dpw.astype(pwk.dtype))


fused_sepconv_affine.defvjp(_fsa_fwd, _fsa_bwd)


# ---------------------------------------------------------------------------
# stats-emitting variants
# ---------------------------------------------------------------------------
#
# ``*_stats`` variants additionally return per-CHANNEL (Σy, Σy²) of the
# bf16-rounded output, two (F,) fp32 vectors accumulated across the
# sequential grid inside the forward kernel.  The consuming BatchNorm2d
# (``stats=``) then never re-reads y for its statistics.  The VJP is
# exact: cotangents arriving on the stats outputs are per-channel, and
# fold into y's cotangent as  dy += gs1 + 2·y·gs2  (the Jacobian of
# Σy / Σy²) — one XLA elementwise pass over (y, g) before the fused
# backward kernel — the same math XLA autodiff produces for explicit
# Σy/Σy² reductions, so BN's gradient path through mean/var is unchanged.


def _stats_adjust(gy, gs1, gs2, y):
    """dy_total = gy + gs1 + 2·y·gs2 (per-channel gs), fp32, cast back."""
    g32 = (gy.astype(jnp.float32) + gs1
           + 2.0 * y.astype(jnp.float32) * gs2)
    return g32.astype(y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_sepconv_stats(x, dwk, pwk, pre_relu: bool = True,
                        dilation: int = 1, interpret: bool = False):
    """``fused_sepconv`` that also returns (Σy, Σy²) tile partials.

    Returns ``(y, s1, s2)`` with y as ``fused_sepconv`` and s1/s2 (F,)
    fp32 per-channel sums of the bf16-rounded output."""
    op, padded = _prep_in(x, pwk.shape[-1], dilation)
    y, s = _fwd_pallas(op, dwk, pwk, pre_relu=pre_relu,
                       dilation=dilation, interpret=interpret,
                       emit_stats=True, padded=padded)
    return y, s[0], s[1]


def _fss_fwd(x, dwk, pwk, pre_relu, dilation, interpret):
    xp, padded = _prep_in(x, pwk.shape[-1], dilation)
    ed = _emit_d(x.shape[1])
    out = _fwd_pallas(xp, dwk, pwk, pre_relu=pre_relu,
                      dilation=dilation, interpret=interpret,
                      emit_stats=True, padded=padded, emit_d=ed)
    (y, s, dem) = out if ed else (out[0], out[1], None)
    return (y, s[0], s[1]), (xp, dwk, pwk, y, dem)


def _stats_inkernel() -> bool:
    """Fold the stats cotangent into gt inside the backward kernel
    (requires nopad mode) — default ON since the r4 A/B (24.03 vs 23.88
    control; the r3 wave-1 re-test also measured +0.1 — two consecutive
    same-session wins, and the fold strictly removes one XLA elementwise
    pass per unit).  DEEPCAM_STATS_INKERNEL=0 opts out."""
    import os

    return os.environ.get("DEEPCAM_STATS_INKERNEL", "1") == "1"


def _fss_bwd(pre_relu, dilation, interpret, res, g):
    xp, dwk, pwk, y, dem = res
    gy, gs1, gs2 = g
    padded = xp.shape[1] != y.shape[1]
    if not padded and _stats_inkernel():
        dx, ddw, dpw = _bwd_pallas(
            xp, gy.astype(xp.dtype), dwk, pwk.T,
            pre_relu=pre_relu, dilation=dilation, interpret=interpret,
            padded=False, stats=(jnp.stack([gs1, gs2]), y), demit=dem,
        )
        return dx, ddw.astype(dwk.dtype), dpw.astype(pwk.dtype)
    gadj = _stats_adjust(gy, gs1, gs2, y)
    if padded:
        gadj = _pad_h(gadj, dilation)
    dx, ddw, dpw = _bwd_pallas(
        xp, gadj, dwk, pwk.T,
        pre_relu=pre_relu, dilation=dilation, interpret=interpret,
        padded=padded, demit=dem,
    )
    return dx, ddw.astype(dwk.dtype), dpw.astype(pwk.dtype)


fused_sepconv_stats.defvjp(_fss_fwd, _fss_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_sepconv_affine_stats(x, a, b, dwk, pwk, pre_relu: bool = True,
                               dilation: int = 1, interpret: bool = False):
    """``fused_sepconv_affine`` that also returns (Σy, Σy²) tile partials."""
    op, padded = _prep_in(x, pwk.shape[-1], dilation)
    y, s = _fwd_pallas(
        op, dwk, pwk, pre_relu=pre_relu, dilation=dilation,
        interpret=interpret, ab=(a.reshape(1, -1), b.reshape(1, -1)),
        emit_stats=True, padded=padded,
    )
    return y, s[0], s[1]


def _fsas_fwd(x, a, b, dwk, pwk, pre_relu, dilation, interpret):
    xp, padded = _prep_in(x, pwk.shape[-1], dilation)
    ed = _emit_d(x.shape[1])
    out = _fwd_pallas(xp, dwk, pwk, pre_relu=pre_relu,
                      dilation=dilation, interpret=interpret,
                      ab=(a.reshape(1, -1), b.reshape(1, -1)),
                      emit_stats=True, padded=padded, emit_d=ed)
    (y, s, dem) = out if ed else (out[0], out[1], None)
    return (y, s[0], s[1]), (xp, a, b, dwk, pwk, y, dem)


def _fsas_bwd(pre_relu, dilation, interpret, res, g):
    xp, a, b, dwk, pwk, y, dem = res
    gy, gs1, gs2 = g
    padded = xp.shape[1] != y.shape[1]
    if not padded and _stats_inkernel():
        dx, ddw, dpw, da, db = _bwd_pallas(
            xp, gy.astype(xp.dtype), dwk, pwk.T,
            pre_relu=pre_relu, dilation=dilation, interpret=interpret,
            ab=(a.reshape(1, -1), b.reshape(1, -1)), padded=False,
            stats=(jnp.stack([gs1, gs2]), y), demit=dem,
        )
        return (dx, da[0].astype(a.dtype), db[0].astype(b.dtype),
                ddw.astype(dwk.dtype), dpw.astype(pwk.dtype))
    gadj = _stats_adjust(gy, gs1, gs2, y)
    if padded:
        gadj = _pad_h(gadj, dilation)
    dx, ddw, dpw, da, db = _bwd_pallas(
        xp, gadj, dwk, pwk.T,
        pre_relu=pre_relu, dilation=dilation, interpret=interpret,
        ab=(a.reshape(1, -1), b.reshape(1, -1)), padded=padded, demit=dem,
    )
    return (dx, da[0].astype(a.dtype), db[0].astype(b.dtype),
            ddw.astype(dwk.dtype), dpw.astype(pwk.dtype))


fused_sepconv_affine_stats.defvjp(_fsas_fwd, _fsas_bwd)


# ---------------------------------------------------------------------------
# block-boundary variant: r = relu(x*a + b + skip) computed (and emitted)
# in-kernel
# ---------------------------------------------------------------------------
#
# The middle-flow block boundary (reference ``Block.forward``: the chain-
# final BN-apply, the residual add at deeplab_xception.py:111-121, and the
# next block's leading inplace ReLU) is an XLA elementwise pass that reads
# the tail pointwise output y2 and the residual stream, and writes the new
# stream r — whose only consumers are the next block's first sepconv and
# its identity skip.  Folding the chain into that sepconv's kernel removes
# the pass: the kernel reads (y2, skip) through its existing haloed
# windows, forms r in VMEM, consumes it for its taps, and emits r once for
# the skip path.  The backward emits d_skip (= du) and d_x (= du·a)
# directly, receiving the r output's external cotangent as one extra
# center-window operand.  ~60 MB/boundary of HBM traffic at the middle-
# flow shape (batch 4), 16 boundaries per step.


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_sepconv_boundary(x, a, b, skip, dwk, pwk, dilation: int = 1,
                           interpret: bool = False):
    """Returns ``(y, r)``: r = relu(x*a + b + skip) (the next residual
    stream) and y = pw(dw3x3(r)).  Parity target: the composition
    ``fused_sepconv(relu(x*a + b + skip), pre_relu=False)`` with the
    boundary chain computed as the same bf16 FMA/add XLA emits."""
    op, padded = _prep_in(x, pwk.shape[-1], dilation)
    sk = skip if not padded else _pad_h(skip, dilation)
    y, r = _fwd_pallas(
        op, dwk, pwk, pre_relu=True, dilation=dilation, interpret=interpret,
        ab=(a.reshape(1, -1), b.reshape(1, -1)), padded=padded, skip=sk,
    )
    return y, r


def _fsb_fwd(x, a, b, skip, dwk, pwk, dilation, interpret):
    op, padded = _prep_in(x, pwk.shape[-1], dilation)
    sk = skip if not padded else _pad_h(skip, dilation)
    y, r = _fwd_pallas(
        op, dwk, pwk, pre_relu=True, dilation=dilation, interpret=interpret,
        ab=(a.reshape(1, -1), b.reshape(1, -1)), padded=padded, skip=sk,
    )
    return (y, r), (op, sk, a, b, dwk, pwk)


def _fsb_bwd(dilation, interpret, res, g):
    xp, sk, a, b, dwk, pwk = res
    gy, gr = g
    padded = xp.shape[1] != gy.shape[1]
    gop = gy.astype(xp.dtype)
    if padded:
        gop = _pad_h(gop, dilation)
    dx, ddw, dpw, da, db, dsk = _bwd_pallas(
        xp, gop, dwk, pwk.T,
        pre_relu=True, dilation=dilation, interpret=interpret,
        ab=(a.reshape(1, -1), b.reshape(1, -1)), padded=padded,
        skip=sk, gr=gr.astype(xp.dtype),
    )
    return (dx, da[0].astype(a.dtype), db[0].astype(b.dtype), dsk,
            ddw.astype(dwk.dtype), dpw.astype(pwk.dtype))


fused_sepconv_boundary.defvjp(_fsb_fwd, _fsb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_sepconv_boundary_stats(x, a, b, skip, dwk, pwk, dilation: int = 1,
                                 interpret: bool = False):
    """``fused_sepconv_boundary`` that also returns (Σy, Σy²) partials:
    ``(y, r, s1, s2)``."""
    op, padded = _prep_in(x, pwk.shape[-1], dilation)
    sk = skip if not padded else _pad_h(skip, dilation)
    y, s, r = _fwd_pallas(
        op, dwk, pwk, pre_relu=True, dilation=dilation, interpret=interpret,
        ab=(a.reshape(1, -1), b.reshape(1, -1)), padded=padded, skip=sk,
        emit_stats=True,
    )
    return y, r, s[0], s[1]


def _fsbs_fwd(x, a, b, skip, dwk, pwk, dilation, interpret):
    op, padded = _prep_in(x, pwk.shape[-1], dilation)
    sk = skip if not padded else _pad_h(skip, dilation)
    y, s, r = _fwd_pallas(
        op, dwk, pwk, pre_relu=True, dilation=dilation, interpret=interpret,
        ab=(a.reshape(1, -1), b.reshape(1, -1)), padded=padded, skip=sk,
        emit_stats=True,
    )
    return (y, r, s[0], s[1]), (op, sk, a, b, dwk, pwk, y)


def _fsbs_bwd(dilation, interpret, res, g):
    xp, sk, a, b, dwk, pwk, y = res
    gy, gr, gs1, gs2 = g
    # stats cotangent folds into gy XLA-side (the in-kernel stats fold is
    # not combined with the boundary form)
    gadj = _stats_adjust(gy, gs1, gs2, y)
    padded = xp.shape[1] != y.shape[1]
    if padded:
        gadj = _pad_h(gadj, dilation)
    dx, ddw, dpw, da, db, dsk = _bwd_pallas(
        xp, gadj, dwk, pwk.T,
        pre_relu=True, dilation=dilation, interpret=interpret,
        ab=(a.reshape(1, -1), b.reshape(1, -1)), padded=padded,
        skip=sk, gr=gr.astype(xp.dtype),
    )
    return (dx, da[0].astype(a.dtype), db[0].astype(b.dtype), dsk,
            ddw.astype(dwk.dtype), dpw.astype(pwk.dtype))


fused_sepconv_boundary_stats.defvjp(_fsbs_fwd, _fsbs_bwd)
