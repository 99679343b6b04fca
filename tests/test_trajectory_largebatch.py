"""Large-batch LAMB trajectory equivalence vs a simulated 8-rank reference.

The pod-scale risk nothing in the per-step goldens exercises is LAMB's
trust-ratio dynamics at a LARGE global batch compounding over a warmup +
milestone schedule (reference large-batch recipe:
``run_training_circe.sh:51-55`` — LAMB + warmup; optimizer wiring
``train_hdf5_ddp.py:217-218``).  This harness runs our full 8-device
shard_map train step at global batch 64 (8 replicas x 8) against a
faithful simulation of the reference's 8-rank DDP semantics in torch:

* each "rank" forward/backwards its own 8-sample shard with its OWN
  BatchNorm batch statistics (DDP never syncs BN);
* gradients are averaged across ranks (allreduce-mean == our pmean);
* running BN stats: every rank starts the step from the same replicated
  snapshot and the post-step stats are the rank average — exactly our
  trainer's ``pmean(new_batch_stats)`` publication rule;
* the update is the numpy port of apex FusedLAMB (grad-norm pre-scale,
  trust ratio, coupled wd) proven per-step in test_lamb_golden.py.

Both loss trajectories and the eval-mode IoU curve (the reference's
acceptance quantity) must track through warmup (step 10) and the 10x
milestone cut (step 25).

Gated behind DEEPCAM_LAMB_TRAJ=1 (a ~10-min CPU run; committed evidence:
``analysis/trajectory_lamb_r5.log``).  TRAJ_LB_STEPS overrides the horizon.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/src/deepCam"
N_STEPS = int(os.environ.get("TRAJ_LB_STEPS", "40"))
WARMUP, MILESTONE = 10, 25
N_RANKS, PER_RANK = 8, 8

pytestmark = pytest.mark.skipif(
    os.environ.get("DEEPCAM_LAMB_TRAJ") != "1",
    reason="long CPU run; set DEEPCAM_LAMB_TRAJ=1 (log committed in analysis/)",
)


def _batches(n_steps, batch, h=32, w=48, c=16, seed=41):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_steps):
        x = rng.rand(batch, h, w, c).astype(np.float32)
        y = np.clip((x[..., 0] * 2.2 + x[..., 1] * 0.8).astype(np.int32), 0, 2)
        out.append((x, y.astype(np.int32)))
    return out


def _lr_schedule():
    from deepcam_tpu.train.schedule import get_lr_schedule

    return get_lr_schedule(
        1e-3,
        {"type": "multistep", "milestones": str(MILESTONE),
         "decay_rate": "0.1"},
        warmup_steps=WARMUP,
        warmup_factor=2.0,
    )


def test_lamb_largebatch_trajectory_tracks_ddp_reference():
    import torch

    sys.path.insert(0, REF)
    try:
        from architecture import deeplab_xception as ref_module
        from utils import losses as ref_losses
    finally:
        sys.path.remove(REF)

    from deepcam_tpu.core import mesh as meshlib
    from deepcam_tpu.models.deeplab import DeepLabv3plus
    from deepcam_tpu.train.losses import class_weights
    from deepcam_tpu.train.metrics import per_sample_iou
    from deepcam_tpu.train.optim import build_optimizer
    from deepcam_tpu.train.trainer import create_train_state, make_train_step
    from tests.test_golden_model import load_into_reference
    from tests.test_lamb_golden import apex_lamb_step

    lr_fn = _lr_schedule()
    weights = list(class_weights())
    eps, wd = 1e-8, 1e-2  # run-script LAMB config

    # ---- our stack: 8-device mesh, global batch 64 ----------------------
    model = DeepLabv3plus(n_classes=3, output_stride=16, dtype=jnp.float32)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 32, 48, 16), jnp.float32),
                             train=False)
    )(jax.random.PRNGKey(27))
    mesh = meshlib.make_mesh()
    assert mesh.shape["data"] == N_RANKS, "expects the 8-device CPU mesh"
    tx = build_optimizer("LAMB", lr_fn, eps=eps, weight_decay=wd)
    state = create_train_state(model, variables, tx)
    state = jax.device_put(state, meshlib.replicated(mesh))
    step_fn = make_train_step(model, tx, weights, mesh)

    # ---- torch stack: one model instance plays all 8 DDP ranks ----------
    net = ref_module.DeepLabv3_plus(
        n_input=16, n_classes=3, os=16, pretrained=False, _print=False
    )
    load_into_reference(net, variables["params"], variables["batch_stats"],
                        ref_module)
    net.train()
    w_t = torch.tensor(weights, dtype=torch.float32)

    t_params = [p for _, p in sorted(net.named_parameters())]
    shadow_p = {i: p.detach().numpy().astype(np.float64)
                for i, p in enumerate(t_params)}
    shadow_m = {i: np.zeros_like(v) for i, v in shadow_p.items()}
    shadow_v = {i: np.zeros_like(v) for i, v in shadow_p.items()}

    bns = [m for m in net.modules()
           if isinstance(m, torch.nn.BatchNorm2d)]

    def ddp_step(x, y, lr):
        """Mean-of-rank grads + rank-averaged running BN stats + one apex
        FusedLAMB update, from the replicated pre-step state."""
        snap = [(b.running_mean.clone(), b.running_var.clone(),
                 b.num_batches_tracked.clone()) for b in bns]
        grad_acc = None
        stats_acc = None
        loss_acc = 0.0
        for r in range(N_RANKS):
            for b, (rm, rv, nb) in zip(bns, snap):
                b.running_mean.copy_(rm)
                b.running_var.copy_(rv)
                b.num_batches_tracked.copy_(nb)
            xs = x[r * PER_RANK:(r + 1) * PER_RANK]
            ys = y[r * PER_RANK:(r + 1) * PER_RANK]
            xt = torch.from_numpy(np.transpose(xs, (0, 3, 1, 2)).copy())
            yt = torch.from_numpy(ys.astype(np.int64))
            out = net(xt)
            loss = ref_losses.fp_loss(out, yt, w_t,
                                      fpw_1=2.61461122397522257612,
                                      fpw_2=1.71641974795896018744)
            net.zero_grad()
            loss.backward()
            loss_acc += float(loss) / N_RANKS
            g = {i: p.grad.detach().numpy().astype(np.float64) / N_RANKS
                 for i, p in enumerate(t_params)}
            grad_acc = g if grad_acc is None else {
                i: grad_acc[i] + g[i] for i in g}
            s = [(b.running_mean.clone(), b.running_var.clone())
                 for b in bns]
            if stats_acc is None:
                stats_acc = [[rm / N_RANKS, rv / N_RANKS] for rm, rv in s]
            else:
                for acc, (rm, rv) in zip(stats_acc, s):
                    acc[0] += rm / N_RANKS
                    acc[1] += rv / N_RANKS
        for b, (rm, rv), (_, _, nb) in zip(bns, stats_acc, snap):
            b.running_mean.copy_(rm)
            b.running_var.copy_(rv)
            b.num_batches_tracked.copy_(nb + 1)
        return grad_acc, loss_acc

    eval_every = int(os.environ.get("TRAJ_EVAL_EVERY", "10"))
    (xv, yv) = _batches(1, batch=4, seed=99)[0]
    xv_t = torch.from_numpy(np.transpose(xv, (0, 3, 1, 2)).copy())

    def eval_iou_ours(state):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(xv), train=False)
        return float(jnp.mean(per_sample_iou(
            jnp.argmax(logits, axis=-1), jnp.asarray(yv))))

    def eval_iou_ref():
        net.eval()
        with torch.no_grad():
            out = net(xv_t)
        net.train()
        pred = out.argmax(dim=1).numpy()
        return float(jnp.mean(per_sample_iou(
            jnp.asarray(pred), jnp.asarray(yv))))

    ours_loss, ref_loss, iou_pairs = [], [], []
    for i, (x, y) in enumerate(_batches(N_STEPS, batch=N_RANKS * PER_RANK)):
        state, metrics = step_fn(state, jnp.asarray(x), jnp.asarray(y))
        ours_loss.append(float(metrics["loss"]))

        grads, loss_r = ddp_step(x, y, float(lr_fn(i)))
        shadow_p, shadow_m, shadow_v = apex_lamb_step(
            shadow_p, grads, shadow_m, shadow_v, i + 1,
            lr=float(lr_fn(i)), eps=eps, wd=wd,
        )
        with torch.no_grad():
            for j, p in enumerate(t_params):
                p.copy_(torch.from_numpy(shadow_p[j].astype(np.float32)))
        ref_loss.append(loss_r)
        if (i + 1) % eval_every == 0:
            iou_pairs.append((i + 1, eval_iou_ours(state), eval_iou_ref()))

    ours = np.asarray(ours_loss)
    ref = np.asarray(ref_loss)
    rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-6)
    print("LB_LOSS_CURVE " + " ".join(
        f"{i}:{o:.4f}/{r:.4f}" for i, (o, r) in
        enumerate(zip(ours, ref))), flush=True)
    print("LB_IOU_CURVE " + " ".join(
        f"{s}:{o:.4f}/{r:.4f}" for s, o, r in iou_pairs), flush=True)
    # the reference trajectory must LEARN through the schedule ...
    assert ref[-1] < 0.8 * ref[0], f"reference did not learn: {ref[:3]}..{ref[-3:]}"
    # ... step-0 parity is exact (same weights, same math) ...
    assert rel[0] < 1e-4, f"step-0 parity broken: {rel[0]:.2e}"
    # ... then a bounded fp32 noise band (trust ratios amplify reduction-
    # order noise relative to the AdamW trajectory; bound measured r5)
    assert np.median(rel) < 2e-2, f"median rel diff {np.median(rel):.4f}"
    assert rel.max() < 0.25, f"trajectory diverged: max rel {rel.max():.4f}"
    assert abs(ours[-5:].mean() - ref[-5:].mean()) / ref[-5:].mean() < 0.1

    assert iou_pairs, "no eval points sampled"
    for step, iou_o, iou_r in iou_pairs:
        assert abs(iou_o - iou_r) < 0.05, (
            f"eval IoU diverged at step {step}: ours {iou_o:.4f} "
            f"vs ref {iou_r:.4f}\nfull curve: {iou_pairs}")
