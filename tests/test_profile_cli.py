"""Profile-driver test on CPU at a small tile (parity: profile_hdf5_ddp.py)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_profile_driver_runs_and_reports(capsys, tmp_path):
    from deepcam_tpu.cli.profile import build_parser, main

    args = build_parser().parse_args([
        "--output_dir", str(tmp_path),
        "--local_batch_size", "1",
        "--num_warmup_steps", "1",
        "--num_profile_steps", "2",
        "--image_size", "64", "96",
        "--amp_opt_level", "O0",
    ])
    report = main(args)
    out = capsys.readouterr().out
    # REPORT lines (parity with profile_hdf5_ddp printr REPORT format)
    assert "REPORT: step 0" in out
    assert "Forward" in report and "Backward" in report and "Optimizer" in report
    assert report["Forward"]["flops"] > 0
    assert report["Backward"]["flops"] > report["Forward"]["flops"]
    assert report["Forward"]["mean_seconds"] > 0
    assert "roofline" in report
    assert np.isfinite(report["roofline"]["achieved_tflops"])


def test_model_freeze_bn_and_lr_groups():
    import jax
    import jax.numpy as jnp

    from deepcam_tpu.models.deeplab import DeepLabv3plus, lr_group_mask

    model = DeepLabv3plus(n_classes=3, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 48, 16))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)

    # freeze_bn: training fwd must NOT update running stats
    _, updates = model.apply(
        variables, x, train=True, freeze_bn=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert all(np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after))

    m1 = lr_group_mask(variables["params"], "1x")
    m10 = lr_group_mask(variables["params"], "10x")
    assert all(jax.tree_util.tree_leaves(m1["xception"]))
    assert not any(jax.tree_util.tree_leaves(m10["xception"]))
    assert all(jax.tree_util.tree_leaves(m10["upsample"]))
    # masks are complementary over the whole tree
    flat1 = jax.tree_util.tree_leaves(m1)
    flat10 = jax.tree_util.tree_leaves(m10)
    assert all(a != b for a, b in zip(flat1, flat10))
