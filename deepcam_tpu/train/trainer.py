"""Jitted, sharded train/eval steps — the TPU-native replacement for the
reference's eager DDP hot loop (``train_hdf5_ddp.py:339-531``).

Design (SURVEY.md §7, "How to Scale Your Model" recipe):

* one ``shard_map`` over a ``Mesh('data', 'spatial')``; each device computes
  on its local batch shard, gradients are ``lax.pmean``-reduced over the data
  axis (the explicit form of DDP's bucketed allreduce — XLA schedules the
  collectives to overlap with remaining backward compute);
* BatchNorm statistics are **local per device** inside ``shard_map`` — the
  exact semantics of the reference's DDP (which never syncs BN).  The
  *running* stats are pmean'd so the replicated state stays consistent
  (the reference checkpoints rank 0's; an average is the deterministic
  single-controller analogue);
* parameters/optimizer state are replicated; the whole state is donated, so
  XLA updates it in place in HBM;
* loss/IoU scalar reductions happen inside the same compiled step — no extra
  host round trips (reference does separate ``dist.reduce`` calls,
  :398-410);
* eval keeps the reference's *per-sample* IoU-averaging semantics
  (:430-494) with a validity mask so TPU-friendly fixed batch shapes can
  cover an uneven validation set exactly once.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.classify import argmax_channels
from .losses import weighted_ce_loss
from .metrics import compute_score, per_sample_iou


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )


def _block_labels(logits, y):
    """Match the labels to the logits' block layout: batched logits
    (N, H/f, W/f, f², C) pair with ``space_to_blocks(y, f)`` — the model
    may emit factor-2 (one block stage) or factor-4 (block-space decoder
    tail) layouts.  Full-res logits pass ``y`` through unchanged."""
    from ..ops.deconv import space_to_blocks

    if logits.ndim == y.ndim + 1:
        return y
    factor = {4: 2, 16: 4}[logits.shape[3]]
    return space_to_blocks(y, factor)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    class_weights: Sequence[float],
    mesh: Mesh,
    fpw_1: float = 0.0,
    fpw_2: float = 0.0,
    remat: bool = False,
    with_grads: bool = False,
    with_iou: bool = True,
):
    """Build the compiled training step.

    Returns ``step_fn(state, x, y) -> (state, metrics)`` where ``x`` is the
    global NHWC batch (sharded over the mesh data axis), ``y`` the labels,
    and metrics = {'loss', 'iou'} are globally averaged scalars (parity with
    the logging-step reductions at train_hdf5_ddp.py:398-410).

    ``with_iou=False`` omits the train-IoU computation: the REFERENCE only
    computes it inside the logging branch (argmax + compute_score at
    train_hdf5_ddp.py:404-410, every ``logging_frequency`` steps) — paying
    the full-batch argmax + per-class mask reductions every step is pure
    overhead the reference's hot loop never has.  The driver compiles the
    no-IoU variant for non-logging steps (r3 trace: the select/reduce
    fusion family behind the IoU counts is ~5 ms of a 167 ms step).

    ``with_grads=True`` additionally returns the pmean'd gradient pytree as
    ``metrics['grads']`` — the functional analogue of the gradient hooks
    ``wandb.watch(net)`` registers in the reference (train_hdf5_ddp.py:326).
    The driver compiles this variant separately and calls it only on watch
    steps, so the default step never pays the extra HBM->host traffic.
    """

    # Block-space loss (default ON, DEEPCAM_BLOCK_LOSS=0 opts out): the
    # model returns logits as (N, H/2, W/2, 4, C) blocks — never
    # materializing the full-res logits whose tiny class dim forces
    # pathological layouts through the decoder (r2 trace: ~14 ms/step of
    # batch-in-sublane reformat copies around deconv3_bn) — and the labels
    # are space-to-depth'd to match.  The weighted-CE mean and the IoU
    # counts are pixel-order-invariant, so train metrics are identical
    # (up to fp summation order) to the full-res form the reference
    # computes (train_hdf5_ddp.py:352-356).
    import os

    block_loss = os.environ.get("DEEPCAM_BLOCK_LOSS", "1") == "1"
    # Pre-s2d input feed (default ON on TPU, r4 A/B 25.23 vs 24.73;
    # DEEPCAM_S2D_INPUT tri-state, see ops/conv_small_ch.py): x arrives
    # space-to-depth'd (N, H/2, W/2, 64) from the host pipeline — conv1
    # consumes the layout directly and the on-device s2d transpose of
    # the full-res input vanishes (~2-3.5 ms/step, r4 trace).  Labels
    # stay full-res.
    from ..ops.conv_small_ch import s2d_input_active

    s2d_in = s2d_input_active()

    def _apply(params, batch_stats, x):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
            block_logits=block_loss,
            s2d_input=s2d_in,
        )

    apply_fn = _apply
    if remat:
        # checkpoint a pure array-only closure (jax.checkpoint rejects the
        # string kwargs of model.apply)
        apply_fn = jax.checkpoint(
            _apply,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )

    # DEEPCAM_PIN_LOGITS=1 pins the logits tensor as materialized (an
    # optimization barrier between the model and the loss).  Hypothesis
    # under test (r3 wave 3): the no-IoU step measured SLOWER than the
    # with-IoU step (22.64 vs 23.98) because without argmax as a second
    # consumer XLA folds the block-logits conv into the loss reduction
    # fusion, knocking it off the MXU; the barrier restores the
    # materialization without paying for the IoU counts.
    pin_logits = os.environ.get("DEEPCAM_PIN_LOGITS", "0") == "1"

    def loss_fn(params, batch_stats, x, y):
        logits, updates = apply_fn(params, batch_stats, x)
        if pin_logits:
            logits = lax.optimization_barrier(logits)
        loss = weighted_ce_loss(
            logits, _block_labels(logits, y), class_weights, fpw_1, fpw_2)
        return loss, (logits, updates["batch_stats"])

    def local_step(state: TrainState, x, y):
        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, x, y)

        # DDP-equivalent gradient averaging over the data axis (ICI).
        grads = lax.pmean(grads, "data")

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # Keep replicated state consistent across devices.
        new_bs = lax.pmean(new_bs, "data")

        metrics = {"loss": lax.pmean(loss, "data")}
        if with_iou:
            preds = argmax_channels(logits)
            iou = compute_score(
                preds, _block_labels(logits, y), num_classes=logits.shape[-1])
            metrics["iou"] = lax.pmean(iou, "data")
        if with_grads:
            metrics["grads"] = grads
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )

    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step(
    model,
    class_weights: Sequence[float],
    mesh: Mesh,
    fpw_1: float = 0.0,
    fpw_2: float = 0.0,
):
    """Build the compiled eval step.

    ``eval_fn(state, x, y, valid) -> (count, loss_sum, iou_sum)`` — globally
    psum'd over the mesh, one entry per *sample* (reference batch-1 eval
    semantics, train_hdf5_ddp.py:430-494).  ``valid`` is a per-sample {0,1}
    mask so fixed-shape padded batches count each real sample exactly once.
    """

    # Block-space eval (follows DEEPCAM_BLOCK_LOSS, default ON;
    # DEEPCAM_BLOCK_EVAL overrides independently): the per-sample loss
    # mean and per-sample IoU are pixel-order-invariant, so validation can
    # consume block-space logits too and skip the full-res logits
    # materialization whose tiny class dim poisons the decoder layouts
    # (same ~14 ms/step reformat pathology the train step avoids).
    # Visualization keeps its own full-res forward (obs/visualizer.py).
    import os

    block_eval = os.environ.get(
        "DEEPCAM_BLOCK_EVAL", os.environ.get("DEEPCAM_BLOCK_LOSS", "1")
    ) == "1"

    def local_eval(params, batch_stats, x, y, valid):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False,
            block_logits=block_eval,
        )
        n_classes = logits.shape[-1]
        yb = _block_labels(logits, y)

        # per-sample pixel-mean weighted CE (batch-1 loss semantics)
        def sample_loss(lg, lb):
            return weighted_ce_loss(lg, lb, class_weights, fpw_1, fpw_2)

        losses = jax.vmap(sample_loss)(logits, yb)
        preds = argmax_channels(logits)
        ious = per_sample_iou(preds, yb, n_classes)

        v = valid.astype(jnp.float32)
        # psum over 'data' ONLY: the in_specs shard the batch over 'data'
        # and replicate it over 'spatial', so including 'spatial' in the
        # reduction would scale count/sums by the spatial factor
        count = lax.psum(jnp.sum(v), "data")
        loss_sum = lax.psum(jnp.sum(losses * v), "data")
        iou_sum = lax.psum(jnp.sum(ious * v), "data")
        return count, loss_sum, iou_sum

    sharded = jax.shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def eval_fn(state: TrainState, x, y, valid):
        return sharded(state.params, state.batch_stats, x, y, valid)

    return jax.jit(eval_fn)
