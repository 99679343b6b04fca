"""GSPMD train step: data x spatial partitioning via sharding annotations.

The reference is data-parallel only (SURVEY.md §2.4).  The TPU-native way to
scale *beyond* that for this CNN workload is to also shard the spatial height
dimension across chips (the sequence-parallel analogue for a (768, 1152)
image, SURVEY.md §5.7).  Rather than hand-writing halo exchanges, this path
uses XLA's SPMD partitioner: the batch is sharded over the mesh 'data' axis
and H over 'spatial'; XLA automatically inserts the halo ``collective-permute``s
for every conv and the cross-shard reductions for BatchNorm means.

Semantic differences vs the shard_map trainer (train/trainer.py), both
documented and intentional:
* BatchNorm statistics become *global* over the whole (sharded) batch and the
  full spatial extent — i.e. sync-BN.  The reference's DDP keeps per-GPU
  stats; use the shard_map trainer for exact parity, this one for scale.
* loss/IoU are computed over the global batch directly (no per-rank
  mean-of-means).

When to use which (the scaling-book recipe): pure DP while the per-chip batch
>= 1 sample; add 'spatial' when per-chip memory or latency demands splitting
a single sample across ICI neighbors.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.classify import argmax_channels
from ..train.losses import weighted_ce_loss
from ..train.metrics import compute_score
from ..train.trainer import TrainState


def batch_spec(mesh: Mesh) -> P:
    """NHWC batch: N over 'data', H over 'spatial'."""
    return P("data", "spatial")


def make_train_step_gspmd(
    model,
    tx: optax.GradientTransformation,
    class_weights: Sequence[float],
    mesh: Mesh,
    fpw_1: float = 0.0,
    fpw_2: float = 0.0,
    remat: bool = False,
):
    """jit-with-shardings training step over Mesh('data', 'spatial').

    Returns ``step_fn(state, x, y) -> (state, metrics)``; ``x``/``y`` must be
    placed with ``NamedSharding(mesh, P('data', 'spatial'))`` (labels shard
    H the same way).  Parameters and optimizer state are replicated.
    """
    def _apply(params, batch_stats, x):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )

    apply_fn = _apply
    if remat:
        # checkpoint a pure array-only closure (jax.checkpoint rejects the
        # string kwargs of model.apply)
        apply_fn = jax.checkpoint(
            _apply,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )

    def loss_fn(params, batch_stats, x, y):
        logits, updates = apply_fn(params, batch_stats, x)
        loss = weighted_ce_loss(logits, y, class_weights, fpw_1, fpw_2)
        return loss, (logits, updates["batch_stats"])

    def step(state: TrainState, x, y):
        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, x, y)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        preds = argmax_channels(logits)
        iou = compute_score(preds, y, num_classes=logits.shape[-1])
        metrics = {"loss": loss, "iou": iou}
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt_state,
            ),
            metrics,
        )

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, batch_spec(mesh))
    return jax.jit(
        step,
        in_shardings=(repl, data_sh, data_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_step_gspmd(
    model,
    class_weights: Sequence[Any],
    mesh: Mesh,
    fpw_1: float = 0.0,
    fpw_2: float = 0.0,
):
    """GSPMD eval step over Mesh('data', 'spatial').

    Same contract as ``train.trainer.make_eval_step``:
    ``eval_fn(state, x, y, valid) -> (count, loss_sum, iou_sum)`` with
    per-*sample* loss/IoU (reference batch-1 eval semantics,
    train_hdf5_ddp.py:430-494) and a {0,1} validity mask.  The code is
    written globally; the SPMD partitioner inserts the halo exchanges for
    the spatially sharded convs and the cross-shard reductions.
    """

    def eval_fn(state: TrainState, x, y, valid):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False,
        )
        n_classes = logits.shape[-1]

        def sample_loss(lg, lb):
            return weighted_ce_loss(lg, lb, class_weights, fpw_1, fpw_2)

        losses = jax.vmap(sample_loss)(logits, y)
        preds = argmax_channels(logits)
        from ..train.metrics import per_sample_iou

        ious = per_sample_iou(preds, y, n_classes)
        v = valid.astype(jnp.float32)
        return jnp.sum(v), jnp.sum(losses * v), jnp.sum(ious * v)

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, batch_spec(mesh))
    valid_sh = NamedSharding(mesh, P("data"))
    return jax.jit(
        eval_fn,
        in_shardings=(repl, data_sh, data_sh, valid_sh),
        out_shardings=(repl, repl, repl),
    )
