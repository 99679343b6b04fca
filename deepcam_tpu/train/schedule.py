"""Learning-rate schedules.

Parity targets:
* multistep decay — ``/root/reference/src/deepCam/utils/parsing_helpers.py:27-37``
  (torch ``MultiStepLR``: lr = start_lr * gamma^(#milestones <= step), stepped
  per *optimizer step*, train_hdf5_ddp.py:369-371);
* linear warmup — ``GradualWarmupScheduler`` semantics
  (train_hdf5_ddp.py:249-258): over ``total_epoch = warmup_steps`` steps the lr
  ramps from ``start_lr`` to ``start_lr * multiplier``; afterwards the wrapped
  after-scheduler runs with its step shifted by ``warmup_steps`` and its base
  lr scaled by ``multiplier``.

Implemented as pure step→lr functions (optax schedules), which is the JAX-
native equivalent of torch's stateful schedulers; resume needs no scheduler
state, only the step counter (SURVEY.md §2.3.10).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax.numpy as jnp


def multistep_schedule(start_lr: float, milestones: Sequence[int], gamma: float):
    """lr(step) = start_lr * gamma ** (number of milestones <= step).

    Matches torch MultiStepLR where ``scheduler.step()`` is called after each
    optimizer step: the lr *used at* optimizer step s (0-based) has decayed at
    every milestone m with m <= s.
    """
    ms = jnp.asarray(sorted(milestones), dtype=jnp.int32)

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.int32)
        n = jnp.sum(ms <= step)
        return start_lr * gamma ** n.astype(jnp.float32)

    return schedule


def warmup_wrap(base_schedule, start_lr: float, warmup_steps: int, multiplier: float):
    """GradualWarmupScheduler semantics around ``base_schedule``.

    During warmup (step < warmup_steps):
        lr = start_lr * ((multiplier - 1) * step / warmup_steps + 1)
    After warmup:
        lr = multiplier * base_schedule(step - warmup_steps)
    """
    if warmup_steps <= 0:
        return base_schedule

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.int32)
        warm = start_lr * (
            (multiplier - 1.0) * step.astype(jnp.float32) / float(warmup_steps) + 1.0
        )
        after = multiplier * base_schedule(step - warmup_steps)
        return jnp.where(step < warmup_steps, warm, after)

    return schedule


def get_lr_schedule(
    start_lr: float,
    scheduler_arg: Optional[Mapping[str, str]],
    warmup_steps: int = 0,
    warmup_factor: float = 1.0,
):
    """Build the full schedule from the reference's CLI dict
    (``--lr_schedule type=multistep,milestones="15000 25000",decay_rate=0.1``,
    parsed by StoreDictKeyPair, train_hdf5_ddp.py:84-90,572).

    With no schedule dict the lr is constant at ``start_lr``.
    """
    if not scheduler_arg:
        return lambda step: jnp.full((), start_lr, dtype=jnp.float32)
    if scheduler_arg["type"] == "multistep":
        milestones = [int(x) for x in str(scheduler_arg["milestones"]).split()]
        gamma = float(scheduler_arg["decay_rate"])
        base = multistep_schedule(start_lr, milestones, gamma)
    else:
        raise ValueError(
            f"Error, scheduler type {scheduler_arg['type']} not supported."
        )
    return warmup_wrap(base, start_lr, warmup_steps, warmup_factor)
