"""Driver-semantics parity tests: determinism, max_validation_steps,
invalid_submission, CLI flag surface."""

import os

import numpy as np
import pytest

from deepcam_tpu.cli.train import build_parser, main
from deepcam_tpu.data.synthetic import make_synthetic_dataset
from deepcam_tpu.obs.mlperf_log import parse_mllog


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    base = tmp_path_factory.mktemp("drv")
    return make_synthetic_dataset(
        str(base / "data"), n_train=8, n_validation=6, shape=(32, 48)
    )


def _args(root, outdir, tag, extra=()):
    return build_parser().parse_args([
        "--data_dir_prefix", root,
        "--output_dir", outdir,
        "--run_tag", tag,
        "--local_batch_size", "1",
        "--max_epochs", "1",
        "--logging_frequency", "1",
        "--validation_frequency", "1",
        "--save_frequency", "0",
        "--amp_opt_level", "O0",
        "--target_iou", "2.0",
        *extra,
    ])


@pytest.mark.slow
def test_seed_determinism(root, tmp_path):
    """Same seed => identical first-step train loss (fixed data order +
    deterministic init, parity with torch.manual_seed semantics)."""
    losses = []
    for i in range(2):
        out = str(tmp_path / f"o{i}")
        main(_args(root, out, f"det{i}"))
        recs = parse_mllog(os.path.join(out, "logs", f"det{i}.log"))
        losses.append(
            [r["value"] for r in recs if r["key"] == "train_loss"][0]
        )
    assert losses[0] == losses[1]


@pytest.mark.slow
def test_max_validation_steps_invalid_submission(root, tmp_path):
    out = str(tmp_path / "mv")
    main(_args(root, out, "mv", extra=["--max_validation_steps", "1"]))
    recs = parse_mllog(os.path.join(out, "logs", "mv.log"))
    keys = [r["key"] for r in recs]
    assert "invalid_submission" in keys  # parity: train_hdf5_ddp.py:317-318
    by = {r["key"]: r for r in recs}
    # eval_samples capped: min(global, steps * eval_batch * chips)
    assert by["eval_samples"]["value"] <= 6


@pytest.mark.slow
@pytest.mark.parametrize("eval_batch", ["1", "16"])
def test_max_validation_steps_sample_budget(tmp_path_factory, eval_batch):
    """The validation budget is ``max_validation_steps + 1`` SAMPLES per
    reference rank (= per local replica), independent of our
    --eval_local_batch_size: the reference's batch-1 loop post-increments
    ``step_val`` and breaks only when it EXCEEDS the flag
    (train_hdf5_ddp.py:484-487).  8 replicas x (1+1) = 16 samples here,
    for eval batch 1 and 16 alike."""
    base = tmp_path_factory.mktemp("mvb")
    root = make_synthetic_dataset(
        str(base / "data"), n_train=8, n_validation=40, shape=(32, 48)
    )
    out = str(base / "out")
    res = main(_args(root, out, "mvb", extra=[
        "--max_validation_steps", "1",
        "--eval_local_batch_size", eval_batch,
    ]))
    assert res["eval_samples_seen"] == 16.0


def test_cli_flag_surface_covers_reference():
    """Every reference CLI flag (train_hdf5_ddp.py:549-577) has a counterpart
    (same name, or a documented TPU-native replacement)."""
    parser = build_parser()
    ours = {a.dest for a in parser._actions}
    reference_flags = [
        "wireup_method", "wandb_certdir", "run_tag", "output_dir",
        "checkpoint", "data_dir_prefix", "max_inter_threads", "max_epochs",
        "save_frequency", "validation_frequency", "max_validation_steps",
        "logging_frequency", "training_visualization_frequency",
        "validation_visualization_frequency", "local_batch_size", "channels",
        "optimizer", "start_lr", "adam_eps", "weight_decay",
        "loss_weight_pow", "lr_warmup_steps", "lr_warmup_factor",
        "lr_schedule", "target_iou", "model_prefix", "amp_opt_level",
        "enable_wandb", "resume_logging",
    ]
    missing = [f for f in reference_flags if f not in ours]
    assert not missing, f"missing reference flags: {missing}"
