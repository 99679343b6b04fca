"""One-shot FULL-RESOLUTION (768, 1152) golden parity vs the torch reference.

The routine golden tests run at (64, 96) — fine for semantics, but the TPU
schedule has shape-dependent branches (nopad windows, s2d phases, the
block-space loss' factor-4 layout) that only take their production form at
the real sample shape (reference input contract: README.md:13-16,
(768, 1152, 16) fp32).  This closes the class of bugs that would only
appear at production shape:

* eval-mode logits parity at (768, 1152) — full decoder/ASPP resize paths
  at the real os=16 grid (48, 72);
* train-mode loss + gradient-cosine parity THROUGH THE PRODUCTION
  BLOCK-SPACE LOSS PATH (``block_logits=True`` + ``_block_labels`` — the
  exact loss form the compiled train step uses, trainer.py:104-155)
  against the reference's full-res ``fp_loss`` (train_hdf5_ddp.py:352-356;
  the weighted-CE mean is pixel-order-invariant so the values must agree).

~10 min on a 4-core box and ~20 GB RSS, so it is gated behind
``DEEPCAM_FULLRES_GOLDEN=1`` and run once per round
(analysis/golden_fullres_r4.log)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/src/deepCam"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("DEEPCAM_FULLRES_GOLDEN") != "1",
        reason="full-resolution golden is a once-per-round run "
               "(DEEPCAM_FULLRES_GOLDEN=1)",
    ),
]

H, W = 768, 1152


@pytest.fixture(scope="module")
def ref_module():
    sys.path.insert(0, REF)
    from architecture import deeplab_xception

    yield deeplab_xception
    sys.path.remove(REF)


def test_fullres_eval_logits_match_reference(ref_module):
    import torch

    from deepcam_tpu.models.deeplab import DeepLabv3plus
    from tests.test_golden_model import load_into_reference

    model = DeepLabv3plus(n_classes=3, output_stride=16, dtype=jnp.float32)
    x_np = np.random.RandomState(0).rand(1, H, W, 16).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(7), jnp.asarray(x_np),
                           train=False)

    rng = np.random.RandomState(1)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.rand(*a.shape).astype(np.float32) * 0.5
            + (0.75 if a.sum() > 0 else -0.25)
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    ours = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(
            variables, jnp.asarray(x_np)))

    net = ref_module.DeepLabv3_plus(
        n_input=16, n_classes=3, os=16, pretrained=False, _print=False
    )
    load_into_reference(
        net, variables["params"], variables["batch_stats"], ref_module
    )
    net.eval()
    with torch.no_grad():
        theirs = net(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)).copy()))
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))

    assert ours.shape == theirs.shape == (1, H, W, 3)
    # same tolerance rationale as the (64,96) golden: random-init running
    # stats amplify magnitudes through 60 layers; fp reduction-order noise
    # scales with them.
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=1e-4 * scale)
    print(f"FULLRES_EVAL ok: scale={scale:.3e} "
          f"max_abs_diff={np.abs(ours - theirs).max():.3e}")


def test_fullres_blockloss_grads_match_reference(ref_module):
    import torch

    from deepcam_tpu.models.deeplab import DeepLabv3plus
    from deepcam_tpu.train.losses import class_weights, weighted_ce_loss
    from deepcam_tpu.train.trainer import _block_labels
    from tests.test_golden_model import load_into_reference

    sys.path.insert(0, REF)
    try:
        from utils import losses as ref_losses
    finally:
        sys.path.remove(REF)

    model = DeepLabv3plus(n_classes=3, output_stride=16, dtype=jnp.float32)
    # batch 2 = the reference's training batch; torch BN rejects batch 1 in
    # train mode at the ASPP global-pool branch ((1, 256, 1, 1))
    x_np = np.random.RandomState(4).rand(2, H, W, 16).astype(np.float32)
    y_np = np.random.RandomState(5).randint(0, 3, size=(2, H, W))
    variables = model.init(jax.random.PRNGKey(11), jnp.asarray(x_np),
                           train=False)
    Wc = list(class_weights())

    def loss_fn(p, bs, x, y):
        # the production train-step loss path: block-space logits
        # (N, H/2, W/2, 4, C) + space_to_blocks'd labels (trainer.py loss_fn)
        logits, _ = model.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"], block_logits=True,
        )
        return weighted_ce_loss(logits, _block_labels(logits, y), Wc)

    loss_ours, ours = jax.jit(jax.value_and_grad(loss_fn))(
        variables["params"], variables["batch_stats"],
        jnp.asarray(x_np), jnp.asarray(y_np),
    )

    net = ref_module.DeepLabv3_plus(
        n_input=16, n_classes=3, os=16, pretrained=False, _print=False
    )
    load_into_reference(
        net, variables["params"], variables["batch_stats"], ref_module
    )
    net.train()
    out = net(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)).copy()))
    loss = ref_losses.fp_loss(
        out, torch.from_numpy(y_np), weight=Wc, fpw_1=0.0, fpw_2=0.0
    )
    loss.backward()

    # loss value: block-space vs full-res weighted-CE mean must agree
    # (pixel-order-invariant reduction; fp32 summation-order noise only)
    rel = abs(float(loss_ours) - float(loss)) / abs(float(loss))
    assert rel < 1e-3, f"loss mismatch at full res: {float(loss_ours)} vs " \
                       f"{float(loss)} (rel {rel:.2e})"

    def cosine(a, b):
        a = a.ravel().astype(np.float64)
        b = b.ravel().astype(np.float64)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))

    checks = [
        ("conv1", ours["xception"]["conv1"]["kernel"],
         net.xception_features.conv1.weight, (2, 3, 1, 0), 0.999),
        # block1 has no leading ReLU (start_with_relu=False) so rep[0] is
        # its first sepconv — our sepconv0
        ("block1.dw", ours["xception"]["block1"]["sepconv0"]["depthwise"]["kernel"],
         net.xception_features.block1.rep[0].conv1.weight, (2, 3, 1, 0), 0.999),
        ("block8.dw", ours["xception"]["block8"]["sepconv1"]["depthwise"]["kernel"],
         net.xception_features.block8.rep[4].conv1.weight, (2, 3, 1, 0), 0.999),
        ("block8.pw", ours["xception"]["block8"]["sepconv1"]["pointwise"]["kernel"],
         net.xception_features.block8.rep[4].pointwise.weight, (2, 3, 1, 0), 0.999),
        ("aspp2", ours["aspp2"]["atrous_conv"]["kernel"],
         net.aspp2.atrous_convolution.weight, (2, 3, 1, 0), 0.999),
        ("deconv1", ours["upsample"]["deconv1"]["kernel"],
         net.upsample.deconv1[0].weight, (2, 3, 0, 1), 0.999),
        ("last_deconv", ours["upsample"]["last_deconv"]["kernel"],
         net.upsample.last_deconv[0].weight, (2, 3, 0, 1), 0.9999),
    ]
    report = []
    for name, mine, ref_param, perm, bar in checks:
        g_ref = np.transpose(ref_param.grad.numpy(), perm)
        c = cosine(np.asarray(mine), g_ref)
        report.append(f"{name}={c:.6f}")
        assert c > bar, f"{name}: cosine {c}"
    print(f"FULLRES_GRADS ok: loss_rel={rel:.2e} " + " ".join(report))
