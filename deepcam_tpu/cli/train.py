"""DeepCAM training driver — TPU-native end-to-end trainer.

Parity target: ``/root/reference/src/deepCam/train_hdf5_ddp.py`` (CLI flags
:548-577, main loop :94-542).  Emits the same MLPerf key contract
(SURVEY.md §2.3.11), uses the same seeds/hyperparameters, stops at the same
convergence criterion (validation mean IoU >= --target_iou), and writes the
same ``<prefix>_step_<N>.cpt`` checkpoints.

TPU-native differences (by design, not omission):
* one controller process per host drives all local chips; the per-chip batch
  is ``--local_batch_size`` and the global batch is chips * local_batch_size;
* the train step is a single jitted ``shard_map`` with psum gradient
  reduction — there is no DDP wrapper, no NCCL, no AMP loss scaling (bf16);
* validation runs at a fixed per-chip batch with a validity mask instead of
  batch-1 loops, preserving the per-sample averaging semantics exactly.
"""

from __future__ import annotations

import argparse as ap
import os
import time

import numpy as np


class StoreDictKeyPair(ap.Action):
    """``--lr_schedule type=multistep,milestones="15000 25000",decay_rate=0.1``
    (parity: train_hdf5_ddp.py:84-90)."""

    def __call__(self, parser, namespace, values, option_string=None):
        my_dict = {}
        for kv in values.split(","):
            k, v = kv.split("=")
            my_dict[k] = v
        setattr(namespace, self.dest, my_dict)


def build_parser() -> ap.ArgumentParser:
    AP = ap.ArgumentParser(description="DeepCAM TPU training")
    AP.add_argument("--wireup_method", type=str, default="auto",
                    choices=["auto", "jax", "dummy"],
                    help="Distributed wireup: auto-detect, force jax.distributed, or none")
    AP.add_argument("--run_tag", type=str, default="deepcam-tpu")
    AP.add_argument("--output_dir", type=str, default="./output")
    AP.add_argument("--checkpoint", type=str, default=None)
    AP.add_argument("--data_dir_prefix", type=str, default="/")
    AP.add_argument("--max_inter_threads", type=int, default=4,
                    help="Maximum number of concurrent readers")
    AP.add_argument("--max_epochs", type=int, default=30)
    AP.add_argument("--save_frequency", type=int, default=100)
    AP.add_argument("--validation_frequency", type=int, default=100)
    AP.add_argument("--max_validation_steps", type=int, default=None)
    AP.add_argument("--logging_frequency", type=int, default=100)
    AP.add_argument("--training_visualization_frequency", type=int, default=0)
    AP.add_argument("--validation_visualization_frequency", type=int, default=0)
    AP.add_argument("--local_batch_size", type=int, default=1,
                    help="Samples per chip per step")
    AP.add_argument("--channels", type=int, nargs="+",
                    default=list(range(16)))
    AP.add_argument("--optimizer", type=str, default="Adam",
                    choices=["Adam", "AdamW", "LAMB"])
    AP.add_argument("--start_lr", type=float, default=1e-3)
    AP.add_argument("--adam_eps", type=float, default=1e-8)
    AP.add_argument("--weight_decay", type=float, default=1e-6)
    AP.add_argument("--loss_weight_pow", type=float, default=-0.125)
    AP.add_argument("--lr_warmup_steps", type=int, default=0)
    AP.add_argument("--lr_warmup_factor", type=float, default=1.0)
    AP.add_argument("--lr_schedule", action=StoreDictKeyPair, default=None)
    AP.add_argument("--target_iou", type=float, default=0.82)
    AP.add_argument("--model_prefix", type=str, default="model")
    AP.add_argument("--amp_opt_level", type=str, default="O1",
                    help="O0 = fp32 compute; O1/O2 = bf16 compute (TPU AMP analogue)")
    AP.add_argument("--enable_wandb", action="store_true")
    AP.add_argument("--wandb_certdir", type=str, default="/opt/certs")
    AP.add_argument("--resume_logging", action="store_true")
    AP.add_argument("--seed", type=int, default=333)
    AP.add_argument("--remat", action="store_true",
                    help="rematerialize middle-flow activations to save HBM")
    AP.add_argument("--eval_local_batch_size", type=int, default=32,
                    help="Per-chip validation batch (semantics stay "
                         "per-sample via the validity mask; the reference "
                         "hardcodes 1, train_hdf5_ddp.py:301-306).  "
                         "Default 32 = the measured eval knee on v5e with "
                         "the overlapped r5 loop: 123.6 samples/s/chip vs "
                         "117.0 at batch 16 (72.4 pre-overlap) and 11.0 "
                         "at batch 1 (analysis/r5_queue/eval_*.log)")
    AP.add_argument("--async_checkpoint", action="store_true",
                    help="write checkpoints from a background thread so the "
                         "step loop never stalls on the ~0.5 GB host fetch "
                         "(save_stop then logs the enqueue, not the publish)")
    AP.add_argument("--checkpoint_format", type=str, default="msgpack",
                    choices=["msgpack", "orbax"],
                    help="msgpack = single-file process-0 save (reference "
                         "parity); orbax = distributed directory format — "
                         "every process writes its own shards, async by "
                         "construction (pod-scale). Restore auto-detects "
                         "either format from the --checkpoint path.")
    AP.add_argument("--spatial", type=int, default=1,
                    help="Spatial partitioning factor: each sample's H dim is "
                         "sharded over this many ICI-neighbor chips; "
                         "1 = pure data parallel (reference DDP parity)")
    AP.add_argument("--spatial_impl", type=str, default="shard_map",
                    choices=["shard_map", "gspmd"],
                    help="shard_map (default): explicit halo-strip "
                         "exchange that keeps every fused Pallas kernel "
                         "active, BN stats sync per spatial group (exact "
                         "reference per-rank-BN semantics with rank = "
                         "group); gspmd: the SPMD-partitioner path "
                         "(global sync-BN, unfused XLA lowering — the "
                         "partitioner cannot shard through the Pallas "
                         "custom-calls)")
    return AP


def main(pargs) -> dict:
    # Heavy imports deferred so --help stays fast.
    import jax
    import jax.numpy as jnp

    from ..ckpt.checkpoint import (
        AsyncCheckpointWriter,
        checkpoint_path,
        restore_checkpoint,
        save_checkpoint,
    )
    from ..core import mesh as meshlib
    from ..data.dataset import CamDataset
    from ..data.pipeline import DataLoader, prefetch_to_device
    from ..models.deeplab import DeepLabv3plus
    from ..obs.mlperf_log import MLPerfLogger
    from ..train.losses import FPW_1, FPW_2, class_weights
    from ..train.optim import build_optimizer
    from ..train.schedule import get_lr_schedule
    from ..train.trainer import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )

    meshlib.init_distributed(pargs.wireup_method)
    comm_rank = meshlib.get_rank()
    comm_size = meshlib.get_size()
    n_chips = jax.device_count()
    n_local = jax.local_device_count()

    spatial = pargs.spatial
    if spatial > 1 and n_local % spatial != 0:
        raise ValueError(
            f"--spatial {spatial} must divide the per-host chip count "
            f"({n_local}) so each spatial group stays on one host's ICI"
        )
    # chips per data replica; batch sizes below are per data REPLICA
    n_replicas = n_chips // spatial
    n_local_replicas = max(n_local // spatial, 1)

    pargs.logging_frequency = max(pargs.logging_frequency, 1)
    log_file = os.path.normpath(
        os.path.join(pargs.output_dir, "logs", pargs.run_tag + ".log")
    )
    logger = MLPerfLogger(log_file, "deepcam", "deepcam_tpu")
    logger.log_start(key="init_start", sync=True)
    logger.log_event(key="cache_clear")

    seed = pargs.seed
    logger.log_event(key="seed", value=seed)

    visualize = (
        pargs.training_visualization_frequency > 0
        or pargs.validation_visualization_frequency > 0
    )
    plot_dir = os.path.join(pargs.output_dir, "plots")
    if comm_rank == 0:
        os.makedirs(pargs.output_dir, exist_ok=True)
        if visualize:
            os.makedirs(plot_dir, exist_ok=True)

    from ..obs.wandb_utils import WandbLogger

    wb = WandbLogger(
        enable=pargs.enable_wandb, rank=comm_rank, certdir=pargs.wandb_certdir,
        run_tag=pargs.run_tag, resume_logging=pargs.resume_logging,
        config={
            "root_dir": pargs.data_dir_prefix,
            "output_dir": pargs.output_dir,
            "max_epochs": pargs.max_epochs,
            "local_batch_size": pargs.local_batch_size,
            "num_workers": comm_size,
            "channels": pargs.channels,
            "optimizer": pargs.optimizer,
            "start_lr": pargs.start_lr,
            "adam_eps": pargs.adam_eps,
            "weight_decay": pargs.weight_decay,
            "model_prefix": pargs.model_prefix,
            "amp_opt_level": pargs.amp_opt_level,
            "loss_weight_pow": pargs.loss_weight_pow,
            "lr_warmup_steps": pargs.lr_warmup_steps,
            "lr_warmup_factor": pargs.lr_warmup_factor,
            **{
                f"lr_schedule_{k}": v
                for k, v in (pargs.lr_schedule or {}).items()
            },
        },
    )

    global_batch_size = pargs.local_batch_size * n_replicas
    logger.log_event(key="global_batch_size", value=global_batch_size)
    logger.log_event(key="opt_name", value=pargs.optimizer)
    logger.log_event(
        key="opt_base_learning_rate",
        value=pargs.start_lr * pargs.lr_warmup_factor,
    )
    logger.log_event(
        key="opt_learning_rate_warmup_steps", value=pargs.lr_warmup_steps
    )
    logger.log_event(
        key="opt_learning_rate_warmup_factor", value=pargs.lr_warmup_factor
    )
    logger.log_event(key="opt_epsilon", value=pargs.adam_eps)

    # ----- model / optimizer / state ------------------------------------
    compute_dtype = jnp.float32 if pargs.amp_opt_level == "O0" else jnp.bfloat16
    n_input_channels = len(pargs.channels)
    n_output_channels = 3
    model = DeepLabv3plus(
        n_classes=n_output_channels, output_stride=16, dtype=compute_dtype
    )

    root_dir = pargs.data_dir_prefix
    train_dir = os.path.join(root_dir, "train")
    statsfile = os.path.join(root_dir, "stats.h5")
    validation_dir = os.path.join(root_dir, "validation")

    # Under O1/O2 the model's first op casts the input to bf16 anyway; the
    # dataset emits bf16 DIRECTLY from the fused native normalize+cast —
    # bit-identical, one less full pass on the host, and half the bytes
    # through batch assembly and host→HBM transfer.
    bf16_in = compute_dtype == jnp.bfloat16
    train_set = CamDataset(
        train_dir, statsfile=statsfile, channels=pargs.channels,
        allow_uneven_distribution=False, shuffle=True,
        comm_size=comm_size, comm_rank=comm_rank, bf16_out=bf16_in,
    )
    validation_set = CamDataset(
        validation_dir, statsfile=statsfile, channels=pargs.channels,
        allow_uneven_distribution=True,
        shuffle=(pargs.max_validation_steps is not None),
        comm_size=comm_size, comm_rank=comm_rank, bf16_out=bf16_in,
    )
    h, w = train_set.data_shape[0], train_set.data_shape[1]

    host_batch = pargs.local_batch_size * n_local_replicas
    # DEEPCAM_S2D_INPUT=1: the host workers emit each training sample in
    # conv1's space-to-depth layout (H/2, W/2, 64) so the on-device s2d
    # transpose of the full-res input vanishes (~2-3.5 ms/step; r4 A/B:
    # 25.23 vs 24.73 samples/s/chip).  Data-parallel only — the GSPMD
    # spatial path shards full-res H and doesn't consume the layout.
    from ..ops.conv_small_ch import s2d_input_active

    s2d_in = s2d_input_active() and pargs.spatial <= 1
    if s2d_input_active() and pargs.spatial > 1:
        # the trainer reads the gate at step-build time — pin it off so
        # the GSPMD spatial step and the full-res loader stay consistent
        os.environ["DEEPCAM_S2D_INPUT"] = "0"
    s2d_tf = None
    if s2d_in:
        from ..ops.conv_small_ch import s2d_host

        def s2d_tf(sample):
            data, label, name = sample
            return s2d_host(data), label, name

    train_loader = DataLoader(
        train_set, host_batch,
        num_workers=min(pargs.max_inter_threads * n_local, host_batch),
        drop_last=True,
        sample_transform=s2d_tf,
    )
    eval_host_batch = pargs.eval_local_batch_size * n_local_replicas
    validation_loader = DataLoader(
        validation_set, eval_host_batch,
        num_workers=min(pargs.max_inter_threads * n_local, eval_host_batch),
        drop_last=False,
    )

    logger.log_event(key="train_samples", value=train_set.global_size)
    if pargs.max_validation_steps is not None:
        # the reference computes this bound with the TRAIN batch size even
        # though its eval loop is batch-1 (train_hdf5_ddp.py:310-311) —
        # reproduced verbatim; the actual evaluated-sample budget below is
        # batch-size-independent
        val_size = min(
            validation_set.global_size,
            pargs.max_validation_steps * pargs.local_batch_size * n_replicas,
        )
    else:
        val_size = validation_set.global_size
    logger.log_event(key="eval_samples", value=val_size)
    if pargs.max_validation_steps is not None:
        logger.log_event(key="invalid_submission")

    # init model params (replicated across hosts via identical seed)
    rng = jax.random.PRNGKey(seed)
    sample_shape = (1, h, w, n_input_channels)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros(sample_shape, jnp.float32), train=False)
    )(rng)

    lr_sched = get_lr_schedule(
        pargs.start_lr, pargs.lr_schedule,
        warmup_steps=pargs.lr_warmup_steps,
        warmup_factor=pargs.lr_warmup_factor,
    )
    tx = build_optimizer(
        pargs.optimizer, lr_sched, eps=pargs.adam_eps,
        weight_decay=pargs.weight_decay,
    )
    state = create_train_state(model, variables, tx)
    del variables

    start_epoch = 0
    if pargs.checkpoint:
        if os.path.isdir(pargs.checkpoint):  # orbax directory format
            from ..ckpt.orbax_ckpt import restore_checkpoint_orbax

            state, start_epoch = restore_checkpoint_orbax(
                pargs.checkpoint, state)
        else:
            state, start_epoch = restore_checkpoint(pargs.checkpoint, state)

    mesh = meshlib.make_mesh(spatial=spatial)
    data_sharding = meshlib.batch_sharding(mesh)
    # 1-D per-sample arrays (the eval validity mask) shard over 'data' only
    from jax.sharding import NamedSharding, PartitionSpec as P

    valid_sharding = NamedSharding(mesh, P("data"))

    # With bf16 compute the model's first op casts the input anyway
    # (deeplab.py: x.astype(dtype)); casting on the HOST instead halves the
    # host->HBM transfer (54 -> 27 MB/sample) with bit-identical results.
    # The dataset normally emits bf16 already (fused native normalize+cast,
    # bf16_out above) — this is a no-copy safety net for fp32 producers.
    input_cast = (
        np.dtype(jnp.bfloat16) if compute_dtype == jnp.bfloat16 else None
    )

    def cast_input(data):
        if input_cast is None:
            return data
        return data.astype(input_cast, copy=False)

    def cast_batches(it):
        for data, label, names in it:
            yield cast_input(data), label, names
    weights = list(class_weights(pargs.loss_weight_pow))
    if spatial > 1 and pargs.spatial_impl == "shard_map":
        # fused-kernel spatial path (parallel/spatial.py): explicit
        # halo-strip exchange inside shard_map — every Pallas kernel and
        # custom VJP stays active, and each spatial GROUP computes exactly
        # one reference DDP rank's BN statistics.
        from ..parallel.spatial import (
            make_eval_step_spatial,
            make_train_step_spatial,
        )

        train_step = make_train_step_spatial(
            model, tx, weights, mesh, fpw_1=FPW_1, fpw_2=FPW_2,
            remat=pargs.remat,
        )
        train_step_metrics = train_step
        eval_step = make_eval_step_spatial(
            model, weights, mesh, fpw_1=FPW_1, fpw_2=FPW_2
        )
    elif spatial > 1:
        # data x spatial via the SPMD partitioner (sync-BN semantics —
        # parallel/gspmd.py docstring); shard_map path keeps DDP parity.
        # The fused sepconv Pallas custom-calls are opaque to the SPMD
        # partitioner (it cannot insert conv halo exchanges through them),
        # so the spatial path runs the unfused XLA lowering, which the
        # partitioner shards automatically.
        from ..models import layers as layerlib

        layerlib.set_sepconv_impl("xla")
        from ..parallel.gspmd import (
            make_eval_step_gspmd,
            make_train_step_gspmd,
        )

        train_step = make_train_step_gspmd(
            model, tx, weights, mesh, fpw_1=FPW_1, fpw_2=FPW_2,
            remat=pargs.remat,
        )
        train_step_metrics = train_step  # GSPMD step always carries metrics
        eval_step = make_eval_step_gspmd(
            model, weights, mesh, fpw_1=FPW_1, fpw_2=FPW_2
        )
    else:
        # One step for hot AND logging steps, WITH the train IoU.  A
        # loss-only hot step was built to mirror the reference (its hot
        # loop computes IoU only in the logging branch) — and measured
        # ~5.6% SLOWER on v5e (r3 wave 3 A/B/A: with-IoU 23.94/23.96 vs
        # without 22.61/22.63/22.64 samples/s/chip, optimization-barrier
        # variant included): the argmax consumer materializes the block
        # logits and XLA schedules the surrounding region better.  The
        # with_iou=False variant stays available in make_train_step for
        # study (DEEPCAM_PIN_LOGITS likewise).
        train_step = make_train_step(
            model, tx, weights, mesh, fpw_1=FPW_1, fpw_2=FPW_2,
            remat=pargs.remat, with_iou=True,
        )
        train_step_metrics = train_step
        eval_step = make_eval_step(
            model, weights, mesh, fpw_1=FPW_1, fpw_2=FPW_2
        )

    # Gradient-histogram watch steps (wandb.watch(net) hooks gradients in the
    # reference, train_hdf5_ddp.py:326).  A third compiled step variant
    # returns the pmean'd grads; built lazily on the first watch step, and
    # gated on the FLAG (identical on every process), never on wb.active
    # (rank-0 only) — different programs across ranks would deadlock the
    # collectives on a pod.  Spatial>1 runs the GSPMD path and logs params
    # only (the partitioner step does not expose grads).
    watch_every = 10 * pargs.logging_frequency
    _grads_step = [None]

    def train_step_with_grads(state, x, y):
        if _grads_step[0] is None:
            _grads_step[0] = make_train_step(
                model, tx, weights, mesh, fpw_1=FPW_1, fpw_2=FPW_2,
                remat=pargs.remat, with_grads=True, with_iou=True,
            )
        return _grads_step[0](state, x, y)

    def is_watch_step(next_step):
        return (
            pargs.enable_wandb and spatial == 1
            and next_step % watch_every == 0
        )

    def is_logging_step(next_step):
        return next_step % pargs.logging_frequency == 0

    # jitted prediction for visualization (reference plots the current batch's
    # argmax at training_visualization_frequency, train_hdf5_ddp.py:374-394)
    from ..ops.classify import argmax_channels

    predict = jax.jit(
        lambda st, x: argmax_channels(
            model.apply(
                {"params": st.params, "batch_stats": st.batch_stats},
                x, train=False,
            )
        )
    )
    viz = None
    if visualize and comm_rank == 0:
        from ..obs.visualizer import CamVisualizer

        viz = CamVisualizer()

    def visualize_sample(state, data, label, names, step, prefix,
                         s2d: bool = False):
        # names covers only the real (unpadded) samples of the batch.
        # ONE sample is host-gathered and predicted replicated — sharding-
        # agnostic (works under data AND data x spatial layouts; the
        # Pallas custom-calls need no partitioner support here) and the
        # eval-mode forward runs at batch 1 instead of the full batch.
        sample_idx = int(np.random.randint(0, len(names)))
        sample = np.asarray(data)[sample_idx:sample_idx + 1]
        if s2d:
            # the s2d input feed delivers (N, H/2, W/2, 64) — restore the
            # full-res layout for the eval-mode predict and the plot
            from ..ops.conv_small_ch import s2d_inv_host

            sample = s2d_inv_host(sample)
        preds = predict(state, jnp.asarray(sample))
        outputfile = os.path.basename(names[sample_idx]).replace(
            "data-", prefix + "-"
        ).replace(".h5", ".png")
        outputfile = os.path.join(plot_dir, outputfile)
        viz.plot(
            names[sample_idx], outputfile,
            np.asarray(sample[0, :, :, 0], dtype=np.float32),
            np.asarray(preds[0]),
            np.asarray(label[sample_idx]),
        )
        wb.log_image(
            f"{prefix}_examples", outputfile,
            "Prediction vs. Ground Truth", step,
        )

    # place state on the mesh (replicated)
    state = jax.device_put(state, meshlib.replicated(mesh))

    if pargs.checkpoint_format == "orbax":
        from ..ckpt.orbax_ckpt import OrbaxCheckpointWriter

        # orbax writes are async by construction; the same writer serves
        # both --async_checkpoint modes (save() preserves publish order)
        ckpt_writer = OrbaxCheckpointWriter()
        if not pargs.async_checkpoint:
            _orbax_sync = ckpt_writer

            class _SyncShim:
                def save(self, path, state, epoch):
                    _orbax_sync.save_sync(path, state, epoch)

                def wait(self):
                    _orbax_sync.wait()

            ckpt_writer = _SyncShim()
    else:
        ckpt_writer = AsyncCheckpointWriter() if pargs.async_checkpoint else None

    step = int(state.step)
    epoch = start_epoch
    current_lr = float(lr_sched(step))
    stop_training = False

    logger.log_end(key="init_stop", sync=True)
    logger.log_start(key="run_start", sync=True)
    run_start_time = time.time()

    from ..data.pipeline import prefetch_put

    def run_validation(state, epoch, step):
        nonlocal stop_training
        logger.log_start(key="eval_start", metadata={"epoch_num": epoch + 1})
        # per-host sample budget: each local REPLICA plays one reference
        # rank, whose batch-1 loop breaks only AFTER processing sample
        # max_validation_steps+1 (post-increment check, train_hdf5_ddp.py
        # :484-487) — a per-RANK sample count, independent of our
        # --eval_local_batch_size
        budget = None
        if pargs.max_validation_steps is not None:
            budget = (pargs.max_validation_steps + 1) * n_local_replicas

        # Every host MUST issue the same number of eval_step calls — the
        # step psums across processes, so a host whose (uneven) validation
        # shard yields fewer batches would deadlock the pod (the last rank
        # absorbs the shard remainder; reference has no in-loop
        # collectives and doesn't care, train_hdf5_ddp.py:430-494).
        # Hosts with smaller shards pad with valid=0 batches up to the
        # globally largest batch count.
        base = validation_set.global_size // max(comm_size, 1)
        max_local = base + validation_set.global_size % max(comm_size, 1)
        n_calls = -(-max_local // eval_host_batch)
        if budget is not None:
            n_calls = min(n_calls, -(-budget // eval_host_batch))

        def host_batches():
            seen_local = 0
            it = iter(validation_loader)
            zero_shape = None
            for _ in range(n_calls):
                try:
                    data, label, names = next(it)
                except StopIteration:
                    h, w = validation_set.data_shape[:2]
                    data = np.zeros(
                        (eval_host_batch, h, w, len(pargs.channels)),
                        np.float32)
                    label = np.zeros((eval_host_batch, h, w), np.int32)
                    yield (cast_input(data), label,
                           np.zeros((eval_host_batch,), np.float32), ())
                    continue
                n = data.shape[0]
                valid = np.ones((n,), np.float32)
                if budget is not None and seen_local + n > budget:
                    valid[max(0, budget - seen_local):] = 0.0
                if n < eval_host_batch:  # pad trailing partial batch
                    pad = eval_host_batch - n
                    data = np.concatenate([data, np.zeros((pad,) + data.shape[1:], data.dtype)])
                    label = np.concatenate([label, np.zeros((pad,) + label.shape[1:], label.dtype)])
                    valid = np.concatenate([valid, np.zeros((pad,), np.float32)])
                seen_local += n
                if budget is not None and seen_local > budget:
                    seen_local = budget
                yield cast_input(data), label, valid, names

        # Overlapped eval loop: batches prefetch to device while the
        # previous eval_step runs, and the (count, loss, iou) partials stay
        # ON DEVICE until one device_get at loop end — the per-batch
        # ``float()`` fetches would serialize a blocking host round trip
        # (~3.3 ms dispatch floor each through the relay) per batch
        # (measured: scripts/eval_bench.py --overlap A/B).
        partials = []
        visualized = False
        for d, l, v, names in prefetch_put(
            host_batches(), (data_sharding, data_sharding, valid_sharding,
                             None),
        ):
            partials.append(eval_step(state, d, l, v))
            if (
                viz is not None
                and pargs.validation_visualization_frequency > 0
                and not visualized
                and names  # pad-only batches carry no real samples
            ):
                visualize_sample(state, d, np.asarray(l), names, step,
                                 "validation")
                visualized = True
        count = loss_sum = iou_sum = 0.0
        for c, ls, isum in jax.device_get(partials):
            count += float(c); loss_sum += float(ls); iou_sum += float(isum)
        loss_avg_val = loss_sum / max(count, 1.0)
        iou_avg_val = iou_sum / max(count, 1.0)
        logger.log_event(key="eval_accuracy", value=iou_avg_val,
                         metadata={"epoch_num": epoch + 1, "step_num": step})
        logger.log_event(key="eval_loss", value=loss_avg_val,
                         metadata={"epoch_num": epoch + 1, "step_num": step})
        wb.log({"eval_loss": loss_avg_val, "eval_accuracy": iou_avg_val}, step)
        if iou_avg_val >= pargs.target_iou:
            logger.log_event(key="target_accuracy_reached", value=pargs.target_iou,
                             metadata={"epoch_num": epoch + 1, "step_num": step})
            stop_training = True
        logger.log_end(key="eval_stop", metadata={"epoch_num": epoch + 1})
        return loss_avg_val, iou_avg_val, count

    final_metrics = {"step": step, "epoch": epoch, "eval_iou": None,
                     "eval_samples_seen": None}

    while True:
        logger.log_start(key="epoch_start",
                         metadata={"epoch_num": epoch + 1, "step_num": step}, sync=True)

        for data, label, names in prefetch_to_device(
            cast_batches(train_loader), data_sharding, data_sharding
        ):
            watch_grads = None
            if is_watch_step(step + 1):
                state, metrics = train_step_with_grads(state, data, label)
                watch_grads = metrics.pop("grads")
            elif is_logging_step(step + 1):
                state, metrics = train_step_metrics(state, data, label)
            else:
                state, metrics = train_step(state, data, label)
            step += 1
            # lr actually used by the update just taken: optax's count was
            # step-1 inside this step (reference logs get_last_lr(),
            # train_hdf5_ddp.py:399-400)
            current_lr = float(lr_sched(step - 1))

            if (
                viz is not None
                and pargs.training_visualization_frequency > 0
                and step % pargs.training_visualization_frequency == 0
            ):
                visualize_sample(
                    state, data, np.asarray(label), names, step, "training",
                    s2d=s2d_in,
                )

            if step % pargs.logging_frequency == 0:
                loss_avg = float(metrics["loss"])
                iou_avg = float(metrics["iou"])
                logger.log_event(key="learning_rate", value=current_lr,
                                 metadata={"epoch_num": epoch + 1, "step_num": step})
                logger.log_event(key="train_accuracy", value=iou_avg,
                                 metadata={"epoch_num": epoch + 1, "step_num": step})
                logger.log_event(key="train_loss", value=loss_avg,
                                 metadata={"epoch_num": epoch + 1, "step_num": step})
                wb.log(
                    {"train_loss": loss_avg, "train_accuracy": iou_avg,
                     "learning_rate": current_lr},
                    step,
                )
                # wandb.watch analogue (train_hdf5_ddp.py:326): per-layer
                # parameter AND gradient histograms at 10x the scalar
                # cadence (matching watch's sparser default log_freq); the
                # grads came out of the with_grads step variant taken above
                if step % watch_every == 0:
                    wb.watch(state.params, watch_grads, step)

            if step % pargs.validation_frequency == 0:
                eval_loss, eval_iou, eval_count = run_validation(
                    state, epoch, step)
                final_metrics["eval_iou"] = eval_iou
                final_metrics["eval_samples_seen"] = eval_count

            if pargs.save_frequency > 0 and step % pargs.save_frequency == 0:
                logger.log_start(key="save_start",
                                 metadata={"epoch_num": epoch + 1, "step_num": step},
                                 sync=True)
                cpath = checkpoint_path(
                    pargs.output_dir, pargs.model_prefix, step
                )
                if ckpt_writer is not None:
                    ckpt_writer.save(cpath, state, epoch)
                else:
                    save_checkpoint(cpath, state, epoch)
                logger.log_end(key="save_stop",
                               metadata={"epoch_num": epoch + 1, "step_num": step},
                               sync=True)

            if stop_training:
                break

        logger.log_end(key="epoch_stop",
                       metadata={"epoch_num": epoch + 1, "step_num": step}, sync=True)
        epoch += 1
        if epoch >= pargs.max_epochs or stop_training:
            break

    if ckpt_writer is not None:
        ckpt_writer.wait()  # publish the last checkpoint before run_stop
    logger.log_end(key="run_stop", sync=True, metadata={"status": "success"})
    logger.close()
    final_metrics.update(
        step=step, epoch=epoch, wall_time=time.time() - run_start_time
    )
    return final_metrics


if __name__ == "__main__":
    main(build_parser().parse_args())
