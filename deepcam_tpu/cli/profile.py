"""DeepCAM profiling driver.

Parity target: ``/root/reference/src/deepCam/profile_hdf5_ddp.py`` — the same
trainer setup (train split only, no validation/wandb) run for
``num_warmup_steps`` + ``num_profile_steps`` with Forward / Backward /
Optimizer phases profiled separately, emitting timestamped ``REPORT:`` lines
(:181,193,254).  TPU replacements: xprof traces instead of nsight
(``--profile`` selects the region that triggers a device trace), XLA cost
analysis + roofline placement instead of nv-nsight metric sweeps.

The three phases are built as separate jitted functions so each can be traced
and timed in isolation, mirroring the reference's phase structure (the
production trainer fuses them into one step — that fused step's roofline is
also reported for the honest end-to-end number).
"""

from __future__ import annotations

import argparse as ap
import datetime as dt
import os
import time


def printr(msg, rank=0):
    """Rank-0 print (parity: profile_hdf5_ddp.py:72-74)."""
    import jax

    if jax.process_index() == rank:
        print(msg, flush=True)


def build_parser() -> ap.ArgumentParser:
    AP = ap.ArgumentParser(description="DeepCAM TPU profiling")
    AP.add_argument("--run_tag", type=str, default="profile")
    AP.add_argument("--output_dir", type=str, default="./profile_out")
    AP.add_argument("--data_dir_prefix", type=str, default=None,
                    help="root with train/ + stats.h5; synthetic data if unset")
    AP.add_argument("--max_inter_threads", type=int, default=4)
    AP.add_argument("--local_batch_size", type=int, default=2)
    AP.add_argument("--channels", type=int, nargs="+", default=list(range(16)))
    AP.add_argument("--optimizer", type=str, default="AdamW",
                    choices=["Adam", "AdamW", "LAMB"])
    AP.add_argument("--start_lr", type=float, default=1e-3)
    AP.add_argument("--adam_eps", type=float, default=1e-8)
    AP.add_argument("--weight_decay", type=float, default=1e-2)
    AP.add_argument("--loss_weight_pow", type=float, default=-0.125)
    AP.add_argument("--num_warmup_steps", type=int, default=1)
    AP.add_argument("--num_profile_steps", type=int, default=4)
    AP.add_argument("--profile", type=str, default=None,
                    choices=[None, "Forward", "Backward", "Optimizer"],
                    help="phase to capture a full xprof device trace for")
    AP.add_argument("--amp_opt_level", type=str, default="O1")
    AP.add_argument("--image_size", type=int, nargs=2, default=[768, 1152])
    AP.add_argument("--tpu_generation", type=str, default="v5e")
    return AP


def main(pargs) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..core import mesh as meshlib
    from ..models.deeplab import DeepLabv3plus
    from ..profiling.profiler import Profile, cost_analysis, roofline
    from ..train.losses import class_weights, weighted_ce_loss
    from ..train.optim import build_optimizer
    from ..utils.sync import host_sync

    comm_rank = jax.process_index()
    h, w = pargs.image_size
    n_ch = len(pargs.channels)
    compute_dtype = jnp.float32 if pargs.amp_opt_level == "O0" else jnp.bfloat16

    printr(f"{dt.datetime.now()}: start training {pargs.run_tag}", 0)

    model = DeepLabv3plus(n_classes=3, dtype=compute_dtype)
    x0 = jnp.zeros((1, h, w, n_ch), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x0, train=False))(
        jax.random.PRNGKey(333)
    )
    tx = build_optimizer(
        pargs.optimizer, pargs.start_lr, eps=pargs.adam_eps,
        weight_decay=pargs.weight_decay,
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = jax.jit(tx.init)(params)
    weights = list(class_weights(pargs.loss_weight_pow))

    # ---- data: one resident device batch (real or synthetic) -------------
    batch = pargs.local_batch_size
    if pargs.data_dir_prefix:
        from ..data.dataset import CamDataset
        from ..data.pipeline import DataLoader

        train_set = CamDataset(
            os.path.join(pargs.data_dir_prefix, "train"),
            statsfile=os.path.join(pargs.data_dir_prefix, "stats.h5"),
            channels=pargs.channels, shuffle=True,
            comm_size=jax.process_count(), comm_rank=comm_rank,
        )
        loader = DataLoader(train_set, batch, num_workers=pargs.max_inter_threads)
        data_np, label_np, _ = next(iter(loader))
    else:
        rng = np.random.RandomState(0)
        data_np = rng.rand(batch, h, w, n_ch).astype(np.float32)
        label_np = rng.randint(0, 3, size=(batch, h, w)).astype(np.int32)
    x = jnp.asarray(data_np)
    y = jnp.asarray(label_np)

    # ---- the three phases as separate compiled functions ----------------
    def forward(params, batch_stats, x, y):
        logits, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=True, mutable=["batch_stats"],
        )
        loss = weighted_ce_loss(logits, y, weights)
        return loss, updates["batch_stats"]

    grad_fn = jax.grad(lambda p, bs, x, y: forward(p, bs, x, y)[0])

    def optimizer_step(grads, opt_state, params):
        updates, new_opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state

    fwd_jit = jax.jit(forward)
    bwd_jit = jax.jit(grad_fn)
    opt_jit = jax.jit(optimizer_step)

    logdir = os.path.join(pargs.output_dir, "xprof", pargs.run_tag)
    if comm_rank == 0:
        os.makedirs(logdir, exist_ok=True)

    grads = None
    phase_times = {"Forward": [], "Backward": [], "Optimizer": []}
    total = pargs.num_warmup_steps + pargs.num_profile_steps
    for step in range(total):
        kw = dict(target=pargs.profile, warmup_steps=pargs.num_warmup_steps,
                  logdir=logdir)
        t0 = time.perf_counter()
        with Profile("Forward", step, **kw):
            loss, _ = fwd_jit(params, batch_stats, x, y)
            host_sync(loss)
        t1 = time.perf_counter()
        with Profile("Backward", step, **kw):
            grads = bwd_jit(params, batch_stats, x, y)
            host_sync(grads)
        t2 = time.perf_counter()
        with Profile("Optimizer", step, **kw):
            params, opt_state = opt_jit(grads, opt_state, params)
            host_sync(params)
        t3 = time.perf_counter()
        if step >= pargs.num_warmup_steps:
            phase_times["Forward"].append(t1 - t0)
            phase_times["Backward"].append(t2 - t1)
            phase_times["Optimizer"].append(t3 - t2)
        printr(
            f"REPORT: step {step}: loss {float(loss):.6f} "
            f"fwd {1e3*(t1-t0):.1f}ms bwd {1e3*(t2-t1):.1f}ms "
            f"opt {1e3*(t3-t2):.1f}ms", 0,
        )

    # ---- cost analysis + roofline ---------------------------------------
    report = {}
    for name, fn, args in [
        ("Forward", forward, (params, batch_stats, x, y)),
        ("Backward", grad_fn, (params, batch_stats, x, y)),
    ]:
        costs = cost_analysis(fn, *args)
        mean_t = float(np.mean(phase_times[name])) if phase_times[name] else 0.0
        report[name] = {
            "flops": costs["flops"],
            "bytes_accessed": costs["bytes_accessed"],
            "mean_seconds": mean_t,
            "tflops_per_sec": costs["flops"] / mean_t / 1e12 if mean_t else 0.0,
        }
        printr(f"REPORT: {name}: {report[name]}", 0)
    report["Optimizer"] = {
        "mean_seconds": float(np.mean(phase_times["Optimizer"]))
        if phase_times["Optimizer"] else 0.0
    }

    rl = roofline(
        lambda p, bs: grad_fn(p, bs, x, y), params, batch_stats,
        generation=pargs.tpu_generation,
    )
    printr("REPORT: " + rl.summary(), 0)
    report["roofline"] = rl.__dict__
    printr(f"{dt.datetime.now()}: done", 0)
    return report


if __name__ == "__main__":
    main(build_parser().parse_args())
