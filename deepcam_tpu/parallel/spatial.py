"""Fused-kernel spatial partitioning: shard_map over ('data', 'spatial')
with explicit halo-strip corrections.

The GSPMD path (parallel/gspmd.py) shards H automatically but cannot
partition *through* the fused-sepconv Pallas custom-calls, so it forfeits
every r2–r4 kernel win (runs the unfused XLA lowering).  This module keeps
ALL custom kernels/VJPs active under spatial sharding with one idea:

    **zero-pad-local op + additive edge-correction strips.**

Every spatial op in the model (3x3 convs, fused sepconv units, stride-2
depthwise, x2 deconvs) already computes the reference's zero-padded 'same'
semantics on whatever H extent it is given.  Run the UNMODIFIED op on the
local H-shard — its only error vs the global computation is in the d edge
rows, where the halo taps saw zeros instead of neighbor rows.  Those
missing contributions are *additive* (every op is a sum of taps, and the
elementwise pre-ops — ReLU/BN-apply/residual — are applied per-row before
the taps), so the fix is:

    y[edge rows] += taps(ppermute(neighbor edge rows)) · kernel

computed as tiny XLA strips (d rows) OUTSIDE the kernels.  Gradients are
exact by construction: the local op's custom VJP is the exact VJP of the
local term, the strip is autodiff-visible XLA (its ppermute transposes to
the reverse permute, routing the neighbor-row cotangents back), and at
global edges ppermute delivers zeros, which the (linear-in-received-rows)
strips map to zero — reproducing the reference's zero padding with no
masks.

Numerics note: the fused kernel rounds its depthwise output to bf16
BEFORE the pointwise matmul; the strip adds a separately-rounded term, so
edge rows match the unsharded computation to bf16 rounding (interior rows
are bit-identical).  Parity tests: tests/test_spatial.py.

BatchNorm under spatial sharding syncs batch statistics over the
'spatial' axis only (``layers.set_bn_sync_axis``): each spatial group
then computes EXACTLY the per-rank statistics of one reference DDP GPU
(which never syncs BN across ranks) — a stronger parity story than the
GSPMD path's global sync-BN.

Reference scope anchors: conv halo semantics implied by ``fixed_padding``
(deeplab_xception.py:45-66); the spatial axis itself is a TPU-native
beyond-parity capability (SURVEY.md §5.7).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# context
# ---------------------------------------------------------------------------

_AXIS: Optional[str] = None
_SIZE: int = 1


def spatial_active() -> bool:
    return _AXIS is not None


def spatial_axis() -> Optional[str]:
    return _AXIS


def spatial_size() -> int:
    return _SIZE


@contextlib.contextmanager
def spatial_mode(axis: str, size: int):
    """Enable the spatial-sharding layer behaviors inside a shard_map body
    (model layers consult ``spatial_active()`` at trace time)."""
    global _AXIS, _SIZE
    prev = (_AXIS, _SIZE)
    _AXIS, _SIZE = axis, size
    from ..models import layers as layerlib

    layerlib.set_bn_sync_axis(axis)
    try:
        yield
    finally:
        _AXIS, _SIZE = prev
        layerlib.set_bn_sync_axis(prev[0])


@contextlib.contextmanager
def replicated_region():
    """Suspend spatial layer behaviors for a region whose tensors are
    full-H replicated (the gathered ASPP neighborhood): BNs there compute
    plain (unsynced) statistics — every chip holds identical values, so a
    sync would only inflate the unbiased-variance count."""
    global _AXIS, _SIZE
    prev = (_AXIS, _SIZE)
    _AXIS, _SIZE = None, 1
    from ..models import layers as layerlib

    layerlib.set_bn_sync_axis(None)
    try:
        yield
    finally:
        _AXIS, _SIZE = prev
        layerlib.set_bn_sync_axis(prev[0])


# ---------------------------------------------------------------------------
# halo movement
# ---------------------------------------------------------------------------


def recv_from_prev(rows: jax.Array) -> jax.Array:
    """Each shard receives the PREVIOUS (lower-index) shard's ``rows``
    (its last d rows, for my top halo); shard 0 receives zeros — the
    global top edge's zero padding."""
    n = _SIZE
    return lax.ppermute(rows, _AXIS, [(i, i + 1) for i in range(n - 1)])


def recv_from_next(rows: jax.Array) -> jax.Array:
    """Each shard receives the NEXT shard's ``rows`` (its first d rows,
    for my bottom halo); the last shard receives zeros."""
    n = _SIZE
    return lax.ppermute(rows, _AXIS, [(i + 1, i) for i in range(n - 1)])


def gather_rows(x: jax.Array) -> jax.Array:
    """All-gather the H-shards into the full-H tensor (replicated across
    the spatial group) — used for the tiny stride-16 ASPP neighborhood
    where atrous rates (6/12/18) exceed the shard extent."""
    return lax.all_gather(x, _AXIS, axis=1, tiled=True)


def my_rows(x_full: jax.Array, hs: int) -> jax.Array:
    """Slice this shard's H rows back out of a full-H (replicated)
    tensor."""
    idx = lax.axis_index(_AXIS)
    return lax.dynamic_slice_in_dim(x_full, idx * hs, hs, 1)


# ---------------------------------------------------------------------------
# correction strips
# ---------------------------------------------------------------------------


def _shift_w_np(t: jax.Array, o: int) -> jax.Array:
    """out[..., w, :] = t[..., w+o, :], zero-filled out of range (the
    kernels' W-edge semantics, XLA-side)."""
    if o == 0:
        return t
    z = jnp.zeros(t.shape[:-2] + (abs(o), t.shape[-1]), t.dtype)
    if o > 0:
        return jnp.concatenate([t[..., o:, :], z], axis=-2)
    return jnp.concatenate([z, t[..., :o, :]], axis=-2)


def _dw_row_taps(rows: jax.Array, krow: jax.Array, dilation: int):
    """Depthwise taps of one kernel ROW over a (N, d, W, C) strip:
    out[..., w, c] = Σ_j rows[..., w + (j-1)·dil, c] · krow[j, c], fp32."""
    acc = None
    k32 = krow.astype(jnp.float32)
    for j in range(3):
        tap = _shift_w_np(rows, (j - 1) * dilation).astype(jnp.float32)
        term = tap * k32[j]
        acc = term if acc is None else acc + term
    return acc


def sepconv_strip_fix(y, h_top, h_bot, dwk, pwk, dilation: int,
                      stats=None, d_local=None):
    """Add the missing cross-shard tap contributions to a sepconv unit's
    local output ``y`` (N, Hs, W, F).

    ``h_top``/``h_bot``: THIS shard's first/last ``d`` rows of the unit's
    depthwise input h (post ReLU/BN-apply/residual — whatever the unit
    applies before its taps); they are ppermuted to the neighbors and the
    received rows supply the taps the local zero padding dropped:

      * rows r < d miss tap i=0 reading h[r-d]  → prev shard's h_bot...
        (prev's LAST d rows = its h_bot; my received top strip)
      * rows r ≥ Hs-d miss tap i=2 reading h[r+d] → next shard's h_top.

    ``stats=(s1, s2)`` (optional): the kernel-emitted (Σy, Σy²) partials —
    returned corrected for the edge-row changes (``y`` pre-fix edge rows
    are re-read for the Σy² delta).  ``d_local``: unused hook for EMIT_D
    parity (the emitted d tensor stays uncorrected; the backward's use of
    it is exact for the LOCAL term, and the strip's own VJP covers the
    correction term — see module docstring).

    Returns ``y_fixed`` or ``(y_fixed, (s1, s2))``.
    """
    d = dilation
    assert y.shape[1] >= d, (
        f"H-shard of {y.shape[1]} rows cannot supply a dilation-{d} halo "
        f"— use fewer spatial shards for this tile size")
    prev_rows = recv_from_prev(h_bot)   # h[-d..-1] for my top edge
    next_rows = recv_from_next(h_top)   # h[Hs..Hs+d-1] for my bottom edge
    pw32 = pwk.astype(jnp.float32)

    # top: rows r ∈ [0, d) miss tap i=0 at h[r-d] = prev_rows[r]
    corr_top_d = _dw_row_taps(prev_rows, dwk[0], d)
    # bottom: rows r ∈ [Hs-d, Hs) miss tap i=2 at h[r+d] = next_rows[r-(Hs-d)]
    corr_bot_d = _dw_row_taps(next_rows, dwk[2], d)
    # the kernel rounds d to bf16 before the pointwise matmul; round the
    # strip the same way before its matmul (edge rows match to bf16)
    corr_top = jnp.einsum(
        "nrwc,cf->nrwf", corr_top_d.astype(y.dtype).astype(jnp.float32),
        pw32).astype(y.dtype)
    corr_bot = jnp.einsum(
        "nrwc,cf->nrwf", corr_bot_d.astype(y.dtype).astype(jnp.float32),
        pw32).astype(y.dtype)

    if stats is not None:
        s1, s2 = stats
        old_top = y[:, :d].astype(jnp.float32)
        old_bot = y[:, -d:].astype(jnp.float32)
        new_top = old_top + corr_top.astype(jnp.float32)
        new_bot = old_bot + corr_bot.astype(jnp.float32)
        ds1 = (jnp.sum(corr_top, axis=(0, 1, 2), dtype=jnp.float32)
               + jnp.sum(corr_bot, axis=(0, 1, 2), dtype=jnp.float32))
        ds2 = (jnp.sum(new_top * new_top - old_top * old_top, axis=(0, 1, 2))
               + jnp.sum(new_bot * new_bot - old_bot * old_bot,
                         axis=(0, 1, 2)))
        s1 = s1 + ds1.reshape((1,) * (s1.ndim - 1) + (-1,))
        s2 = s2 + ds2.reshape((1,) * (s2.ndim - 1) + (-1,))
        y = y.at[:, :d].add(corr_top).at[:, -d:].add(corr_bot)
        return y, (s1, s2)

    return y.at[:, :d].add(corr_top).at[:, -d:].add(corr_bot)


def dw_s2_strip_fix(y_pw, h_top_unused, h_bot, dwk, pwk):
    """Stride-2 sepconv tail (depthwise 3x3/s2/p1 → pointwise): the local
    output row 0 misses tap i=0 reading h[-1] (the previous shard's last
    row); bottom rows read only in-shard (even Hs).  ``h_bot`` is this
    shard's LAST row of the depthwise input."""
    prev_row = recv_from_prev(h_bot)  # (N, 1, W, C)
    # stride-2 W sampling: out[0, ow] reads h[-1, 2·ow + j - 1] — the
    # stride-1 tap row subsampled at the even positions
    corr_d = _dw_row_taps(prev_row, dwk[0], 1)[:, :, 0::2, :]
    corr = jnp.einsum(
        "nrwc,cf->nrwf", corr_d.astype(y_pw.dtype).astype(jnp.float32),
        pwk.astype(jnp.float32)).astype(y_pw.dtype)
    return y_pw.at[:, :1].add(corr)


def conv3x3_strip_fix(y, x, kernel, stride: int, dilation: int = 1):
    """Dense 3x3 conv (padding=dilation) strip fix — the entry convs and
    the decoder refinement convs.  ``kernel`` is (3, 3, Cin, F); the
    conv's own compute dtype is ``y.dtype``."""
    d = dilation
    kd = kernel.astype(y.dtype)

    def row_conv(rows, krow):
        # (N, d, W, Cin) ⊛_W krow (3, Cin, F), zero W edges, stride along W
        return lax.conv_general_dilated(
            rows.astype(y.dtype), krow[None], (1, stride),
            ((0, 0), (d, d)), rhs_dilation=(1, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    if stride == 1:
        prev_rows = recv_from_prev(x[:, -d:])
        next_rows = recv_from_next(x[:, :d])
        y = y.at[:, :d].add(row_conv(prev_rows, kd[0]))
        y = y.at[:, -d:].add(row_conv(next_rows, kd[2]))
        return y
    assert stride == 2 and d == 1
    # out row 0 reads x[-1]; bottom out rows stay in-shard
    prev_row = recv_from_prev(x[:, -1:])
    return y.at[:, :1].add(row_conv(prev_row, kd[0]))


def deconv_k3s2_strip_fix(y, x, kernel, block_out: bool = False):
    """x2 transposed conv (k3/s2/p1/op1) strip fix.  Derivation (1-D,
    flipped kernel Kf): out[2i] = Kf[1]·x[i]; out[2i+1] = Kf[0]·x[i] +
    Kf[2]·x[i+1].  The only cross-shard term is the LAST local odd row
    reading x[Hs] — the next shard's first row.  The strip itself is a
    full W-deconv of that one row with kernel row Kf[2].

    ``block_out=True``: ``y`` is the block-space (N, Hs, W, 4, F) output
    (deconv3x3s2_blocks); the correction lands on block row Hs-1's a=1
    phases."""
    kf = jnp.flip(kernel, axis=(0, 1)).astype(x.dtype)
    next_row = recv_from_next(x[:, :1])  # (N, 1, W, C)
    corr = lax.conv_general_dilated(
        next_row, kf[2:3], (1, 1), ((0, 0), (1, 2)),
        lhs_dilation=(1, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (N, 1, 2W, F)
    if not block_out:
        return y.at[:, -1:].add(corr.astype(y.dtype))
    n, _, w2, f = corr.shape
    w = w2 // 2
    # full-res W index = 2w + b → (N, 1, W, b, F); a=0 rows need nothing
    corr_b = corr.reshape(n, 1, w, 2, f)
    zeros = jnp.zeros_like(corr_b)
    corr4 = jnp.stack([zeros, corr_b], axis=3)  # (N, 1, W, a, b, F)
    return y.at[:, -1:].add(
        corr4.reshape(n, 1, w, 4, f).astype(y.dtype))


# ---------------------------------------------------------------------------
# spatial metrics helpers
# ---------------------------------------------------------------------------


def compute_score_spatial(preds, labels, num_classes: int, axis: str):
    """Mean IoU with tp/fp/fn counts psum'd over the spatial axis before
    the ratio — the exact global-image score of ``metrics.compute_score``
    computed from H-shards."""
    p = preds.astype(jnp.int32)
    t = labels.astype(jnp.int32)
    equal = p == t
    iou_sum = jnp.zeros((), jnp.float32)
    for j in range(num_classes):
        is_t = t == j
        is_p = p == j
        tp = lax.psum(jnp.sum((equal & is_t).astype(jnp.float32)), axis)
        fp = lax.psum(jnp.sum(((~equal) & is_p).astype(jnp.float32)), axis)
        fn = lax.psum(jnp.sum(((~equal) & is_t).astype(jnp.float32)), axis)
        union = tp + fp + fn
        iou = jnp.where(union > 0, tp / jnp.where(union > 0, union, 1.0), 1.0)
        iou_sum = iou_sum + iou
    return iou_sum / num_classes


def per_sample_iou_spatial(preds, labels, num_classes: int, axis: str):
    """(N,) per-sample IoUs from H-shards (reference batch-1 eval
    semantics, cross-shard counts)."""
    def one(p, t):
        return compute_score_spatial(p, t, num_classes, axis)

    return jax.vmap(one)(preds, labels)


# ---------------------------------------------------------------------------
# spatial train / eval steps (shard_map over ('data', 'spatial'))
# ---------------------------------------------------------------------------


def make_train_step_spatial(model, tx, class_weights, mesh, fpw_1=0.0,
                            fpw_2=0.0, remat=False, with_iou=True):
    """Fused-kernel data x spatial training step.

    Same contract as ``train.trainer.make_train_step`` with x/y sharded
    ``P('data', 'spatial')`` (N over data replicas, H over each replica's
    spatial group).  Each spatial GROUP plays one reference DDP rank:
    BatchNorm statistics sync over 'spatial' only, gradients psum over
    'spatial' and pmean over 'data' — exactly DDP's per-rank-stats +
    allreduce-mean semantics with rank = group.
    """
    import os

    import optax
    from jax.sharding import PartitionSpec as P

    from ..train.losses import weighted_ce_loss
    from ..train.trainer import TrainState, _block_labels
    from ..ops.classify import argmax_channels

    s = mesh.shape["spatial"]
    block_loss = os.environ.get("DEEPCAM_BLOCK_LOSS", "1") == "1"

    def _apply(params, batch_stats, x):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"], block_logits=block_loss,
        )

    apply_fn = _apply
    if remat:
        apply_fn = jax.checkpoint(
            _apply,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )

    def local_step(state, x, y):
        with spatial_mode("spatial", s):
            def loss_fn(params, batch_stats):
                logits, updates = apply_fn(params, batch_stats, x)
                loss = weighted_ce_loss(
                    logits, _block_labels(logits, y), class_weights,
                    fpw_1, fpw_2)
                return loss, (logits, updates["batch_stats"])

            (loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats)

        # Σ over devices of the per-device grads is the exact gradient of
        # Σ of the per-device local losses (the halo ppermutes transpose
        # cross-shard cotangents back) → mean over ALL devices matches
        # DDP's allreduce-mean of per-rank mean losses.
        grads = lax.pmean(grads, ("data", "spatial"))
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        # spatially synced already (BN pmeans over 'spatial'); replicate
        # across data replicas like the DP trainer
        new_bs = lax.pmean(new_bs, ("data", "spatial"))
        metrics = {"loss": lax.pmean(loss, ("data", "spatial"))}
        if with_iou:
            preds = argmax_channels(logits)
            iou = compute_score_spatial(
                preds, _block_labels(logits, y), logits.shape[-1],
                "spatial")
            metrics["iou"] = lax.pmean(iou, "data")
        return TrainState(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt_state,
        ), metrics

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P("data", "spatial"), P("data", "spatial")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step_spatial(model, class_weights, mesh, fpw_1=0.0,
                           fpw_2=0.0):
    """Spatial eval step — same contract as ``make_eval_step``:
    ``(state, x, y, valid) -> (count, loss_sum, iou_sum)`` with per-SAMPLE
    loss/IoU (reference batch-1 semantics), computed from H-shards via
    cross-shard count psums."""
    import os

    from jax.sharding import PartitionSpec as P

    from ..train.losses import weighted_ce_loss
    from ..train.trainer import _block_labels
    from ..ops.classify import argmax_channels

    s = mesh.shape["spatial"]
    block_eval = os.environ.get(
        "DEEPCAM_BLOCK_EVAL", os.environ.get("DEEPCAM_BLOCK_LOSS", "1")
    ) == "1"

    def local_eval(params, batch_stats, x, y, valid):
        with spatial_mode("spatial", s):
            logits = model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=False, block_logits=block_eval,
            )
        n_classes = logits.shape[-1]
        yb = _block_labels(logits, y)

        def sample_loss(lg, lb):
            return weighted_ce_loss(lg, lb, class_weights, fpw_1, fpw_2)

        # per-sample pixel-mean over the full image = pmean over equal
        # H-shards of the local pixel means
        losses = lax.pmean(jax.vmap(sample_loss)(logits, yb), "spatial")
        preds = argmax_channels(logits)
        ious = per_sample_iou_spatial(preds, yb, n_classes, "spatial")

        v = valid.astype(jnp.float32)
        # psum over 'data' only: every spatial member holds identical
        # per-sample metrics after the cross-shard reductions above
        count = lax.psum(jnp.sum(v), "data")
        loss_sum = lax.psum(jnp.sum(losses * v), "data")
        iou_sum = lax.psum(jnp.sum(ious * v), "data")
        return count, loss_sum, iou_sum

    sharded = jax.shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(), P(), P("data", "spatial"), P("data", "spatial"),
                  P("data")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def eval_fn(state, x, y, valid):
        return sharded(state.params, state.batch_stats, x, y, valid)

    return jax.jit(eval_fn)
