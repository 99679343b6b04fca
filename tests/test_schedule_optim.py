"""LR schedule and optimizer parity tests vs torch."""

import jax.numpy as jnp
import numpy as np
import torch

from deepcam_tpu.train.optim import build_optimizer
from deepcam_tpu.train.schedule import get_lr_schedule, multistep_schedule, warmup_wrap


def test_multistep_matches_torch():
    start_lr, gamma = 1e-3, 0.1
    milestones = [5, 9]
    sched = multistep_schedule(start_lr, milestones, gamma)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=start_lr)
    tsched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=milestones, gamma=gamma)
    for step in range(12):
        lr_torch = tsched.get_last_lr()[0]  # lr used at this optimizer step
        np.testing.assert_allclose(float(sched(step)), lr_torch, rtol=1e-6)
        opt.step()
        tsched.step()


def test_multistep_resume_semantics():
    """Resuming at last_step reproduces the same lr sequence — the pure
    function needs only the step counter (reference rebuilds MultiStepLR with
    last_epoch=start_step, parsing_helpers.py:35)."""
    sched = multistep_schedule(1e-3, [3, 6], 0.5)
    full = [float(sched(s)) for s in range(10)]
    resumed = [float(sched(s)) for s in range(4, 10)]
    np.testing.assert_allclose(full[4:], resumed)


def test_warmup_ramp_and_handoff():
    base = multistep_schedule(1e-3, [100], 0.1)
    sched = warmup_wrap(base, 1e-3, warmup_steps=4, multiplier=8.0)
    # step 0 -> start_lr, step 4 -> start_lr * multiplier
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(2)), 1e-3 * (7 * 2 / 4 + 1), rtol=1e-6)
    np.testing.assert_allclose(float(sched(4)), 8e-3, rtol=1e-6)
    # after warmup the base schedule runs scaled by the multiplier
    np.testing.assert_allclose(float(sched(10)), 8e-3, rtol=1e-6)


def test_get_lr_schedule_cli_dict():
    sched = get_lr_schedule(
        1e-3, {"type": "multistep", "milestones": "5 8", "decay_rate": "0.1"}
    )
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(5)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(8)), 1e-5, rtol=1e-6)


def _torch_adam_like(name, lr, eps, wd, grads_np, x0, steps):
    p = torch.nn.Parameter(torch.from_numpy(x0.copy()))
    if name == "Adam":
        opt = torch.optim.Adam([p], lr=lr, eps=eps, weight_decay=wd)
    elif name == "AdamW":
        opt = torch.optim.AdamW([p], lr=lr, eps=eps, weight_decay=wd)
    for s in range(steps):
        opt.zero_grad()
        p.grad = torch.from_numpy(grads_np[s].copy())
        opt.step()
    return p.detach().numpy()


def test_adam_and_adamw_match_torch():
    rng = np.random.RandomState(0)
    x0 = rng.randn(7).astype(np.float32)
    grads = rng.randn(5, 7).astype(np.float32)
    for name in ["Adam", "AdamW"]:
        tx = build_optimizer(name, 1e-3, eps=1e-8, weight_decay=1e-2)
        params = jnp.asarray(x0)
        state = tx.init(params)
        for s in range(5):
            updates, state = tx.update(jnp.asarray(grads[s]), state, params)
            params = params + updates
        expected = _torch_adam_like(name, 1e-3, 1e-8, 1e-2, grads, x0, 5)
        np.testing.assert_allclose(np.asarray(params), expected, rtol=2e-4, atol=2e-6)


def test_lamb_builds_and_steps():
    tx = build_optimizer("LAMB", 1e-3, eps=1e-8, weight_decay=1e-2)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4)) * 0.1, "b": jnp.ones((4,)) * 0.1}
    updates, _ = tx.update(grads, state, params)
    assert jnp.all(jnp.isfinite(updates["w"]))
