"""Run-log analysis + roofline plot tests (analysis/* notebook parity)."""

import os

import numpy as np

from deepcam_tpu.obs.analysis import extract_series, run_summary
from deepcam_tpu.obs.mlperf_log import MLPerfLogger


def _write_fake_run(path):
    logger = MLPerfLogger(path, barrier_fn=lambda: None)
    logger.log_start(key="run_start")
    logger.log_event(key="global_batch_size", value=16)
    logger.log_start(key="epoch_start", metadata={"epoch_num": 1, "step_num": 0})
    for s in (1, 2):
        logger.log_event(key="train_loss", value=1.0 / s,
                         metadata={"epoch_num": 1, "step_num": s})
        logger.log_event(key="learning_rate", value=1e-3,
                         metadata={"epoch_num": 1, "step_num": s})
    logger.log_event(key="eval_accuracy", value=0.83,
                     metadata={"epoch_num": 1, "step_num": 2})
    logger.log_event(key="target_accuracy_reached", value=0.82,
                     metadata={"epoch_num": 1, "step_num": 2})
    logger.log_end(key="epoch_stop", metadata={"epoch_num": 1, "step_num": 2})
    logger.log_end(key="run_stop", metadata={"status": "success"})
    logger.close()


def test_run_summary(tmp_path):
    path = str(tmp_path / "run.log")
    _write_fake_run(path)
    s = run_summary(path)
    assert s["target_accuracy_reached"] is True
    assert s["target_step"] == 2
    assert s["epochs"] == 1
    assert s["global_batch_size"] == 16
    assert s["wall_seconds"] is not None and s["wall_seconds"] >= 0
    assert [v for _, _, v in s["train_loss"]] == [1.0, 0.5]


def test_extract_series(tmp_path):
    path = str(tmp_path / "run.log")
    _write_fake_run(path)
    from deepcam_tpu.obs.mlperf_log import parse_mllog

    series = extract_series(parse_mllog(path), "learning_rate")
    assert [step for _, step, _ in series] == [1, 2]


def test_roofline_plot(tmp_path):
    from deepcam_tpu.profiling.roofline_plot import plot_roofline

    out = str(tmp_path / "roof.png")
    plot_roofline(
        [
            {"arithmetic_intensity": 100, "achieved_tflops": 70, "label": "fwd"},
            {"arithmetic_intensity": 120, "achieved_tflops": 50, "label": "bwd"},
        ],
        generation="v5e",
        output_path=out,
    )
    assert os.path.getsize(out) > 5000


def test_committed_convergence_log_reaches_target():
    """The committed round-2 convergence run (synthetic 64x96, LAMB +
    warmup + multistep on the 8-device mesh) must parse and show
    target_accuracy_reached — the reference's acceptance criterion
    (train_hdf5_ddp.py:505-507)."""
    import os

    from deepcam_tpu.obs.analysis import run_summary

    log = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "analysis", "convergence_r2.log",
    )
    s = run_summary(log)
    assert s["target_accuracy_reached"] is True
    assert s["target_step"] == 96
    assert len(s["eval_accuracy"]) == 3
    # eval IoU increased monotonically to the 0.6 target
    ious = [v for _, _, v in s["eval_accuracy"]]
    assert ious == sorted(ious) and ious[-1] >= 0.6
