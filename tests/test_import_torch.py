"""Torch-checkpoint / pretrained-backbone import (tools/import_torch_checkpoint).

Roundtrip proof: save a reference-format torch checkpoint (DDP-prefixed
state_dict + AdamW optimizer state after one real step, exactly what
train_hdf5_ddp.py:515-527 writes), import it, and require our model's
eval-mode logits to match the torch net's — the inverse of the golden-test
mapping.  Plus unit coverage of the pretrained-Xception key remap
(deeplab_xception.py:254-280 semantics).
"""

import sys

import numpy as np
import pytest
import torch

REF = "/root/reference/src/deepCam"


@pytest.fixture(scope="module")
def ref_module():
    sys.path.insert(0, REF)
    from architecture import deeplab_xception  # noqa: E402

    yield deeplab_xception
    sys.path.remove(REF)


@pytest.mark.slow
def test_checkpoint_roundtrip_logits_and_moments(ref_module, tmp_path):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from deepcam_tpu.models.deeplab import DeepLabv3plus
    from deepcam_tpu.tools.import_torch_checkpoint import convert_checkpoint

    torch.manual_seed(333)
    net = ref_module.DeepLabv3_plus(
        n_input=16, n_classes=3, os=16, pretrained=False, _print=False
    )
    opt = torch.optim.AdamW(net.parameters(), lr=1e-3, eps=1e-8,
                            weight_decay=1e-6)
    # one real train step so BN running stats and Adam moments are non-trivial
    x = torch.randn(2, 16, 64, 96)
    net.train()
    loss = net(x).square().mean()
    loss.backward()
    opt.step()

    cpt = str(tmp_path / "ref_step_7.cpt")
    torch.save(
        {
            "step": 7,
            "epoch": 2,
            "model": {f"module.{k}": v for k, v in net.state_dict().items()},
            "optimizer": opt.state_dict(),
        },
        cpt,
    )

    out = str(tmp_path / "ours_step_7.cpt")
    info = convert_checkpoint(cpt, out, optimizer="AdamW")
    assert info["step"] == 7 and info["epoch"] == 2

    # ---- logits parity (eval mode: exercises params AND running stats) ----
    model = DeepLabv3plus(n_classes=3, output_stride=16, dtype=jnp.float32)
    template = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 64, 96, 16), jnp.float32),
                             train=False)
    )(jax.random.PRNGKey(0))
    from deepcam_tpu.train.optim import build_optimizer
    from deepcam_tpu.train.trainer import create_train_state

    tx = build_optimizer("AdamW", 1e-3, eps=1e-8, weight_decay=1e-6)
    state_t = create_train_state(model, template, tx)
    payload = {
        "step": np.asarray(0), "epoch": np.asarray(0),
        "params": state_t.params, "batch_stats": state_t.batch_stats,
        "opt_state": state_t.opt_state,
    }
    with open(out, "rb") as f:
        restored = serialization.from_bytes(payload, f.read())
    assert int(restored["step"]) == 7

    x_np = np.random.RandomState(3).rand(1, 64, 96, 16).astype(np.float32)
    ours = np.asarray(
        model.apply(
            {"params": restored["params"],
             "batch_stats": restored["batch_stats"]},
            jnp.asarray(x_np), train=False,
        )
    )
    net.eval()
    with torch.no_grad():
        theirs = net(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)).copy()))
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=1e-4 * scale)

    # ---- Adam moments landed in the optax state ----
    adam_states = [
        s for s in jax.tree_util.tree_leaves(
            restored["opt_state"],
            is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState),
        )
        if isinstance(s, optax.ScaleByAdamState)
    ]
    assert adam_states, "no ScaleByAdamState in restored opt_state"
    st = adam_states[0]
    assert int(np.asarray(st.count)) == 1  # one torch step taken
    exp_avg = opt.state_dict()["state"][0]["exp_avg"].numpy()  # conv1.weight
    got = np.asarray(st.mu["xception"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        got, np.transpose(exp_avg, (2, 3, 1, 0)), rtol=1e-6, atol=1e-8
    )
    nu0 = np.asarray(st.nu["xception"]["conv1"]["kernel"])
    assert nu0.max() > 0  # second moments are non-trivial too


def test_remap_pretrained_keys_rules():
    from deepcam_tpu.tools.import_torch_checkpoint import remap_pretrained_keys

    pre = {
        "block12.rep.0.conv1.weight": 1,
        "block11.rep.0.conv1.weight": 2,
        "block3.rep.0.pointwise.weight": np.zeros((8, 4), np.float32),
        "conv3.conv1.weight": 3,
        "bn3.weight": 4,
        "conv4.pointwise.weight": np.zeros((6, 2), np.float32),
        "bn4.running_mean": 5,
        "conv1.weight": 6,
    }
    out = remap_pretrained_keys(pre)
    assert out["block20.rep.0.conv1.weight"] == 1
    assert out["block12.rep.0.conv1.weight"] == 2
    assert "block11.rep.0.conv1.weight" not in out
    # pointwise (O, I) -> (O, I, 1, 1)
    assert out["block3.rep.0.pointwise.weight"].shape == (8, 4, 1, 1)
    assert out["conv3.conv1.weight"] == 3
    # bn3 duplicated into bn4
    assert out["bn3.weight"] == 4 and out["bn4.weight"] == 4
    assert out["conv5.pointwise.weight"].shape == (6, 2, 1, 1)
    assert out["bn5.running_mean"] == 5
    assert out["conv1.weight"] == 6


@pytest.mark.slow
def test_pretrained_backbone_partial_import(ref_module):
    """Synthesize a cadene-style dict from a torch net's own backbone and
    verify the remap+import lands those slots (and only those) in our tree."""
    import jax
    import jax.numpy as jnp

    from deepcam_tpu.models.deeplab import DeepLabv3plus
    from deepcam_tpu.tools.import_torch_checkpoint import (
        import_pretrained_xception,
    )

    torch.manual_seed(1)
    net = ref_module.DeepLabv3_plus(
        n_input=16, n_classes=3, os=16, pretrained=False, _print=False
    )
    xsd = net.xception_features.state_dict()

    # Inverse of the reference remap: what a cadene file would need to contain
    # for these slots to land (block11->block12, block12->block20, conv4->conv5,
    # bn4->bn5; pointwise stored 2-D in the cadene file).
    pre = {}
    for k, v in xsd.items():
        if k.startswith("block12."):
            src = k.replace("block12.", "block11.")
        elif k.startswith("block20."):
            src = k.replace("block20.", "block12.")
        elif k.startswith(("block1.", "block2.", "block3.")):
            src = k
        elif k.startswith(("conv1.", "bn1.", "conv2.", "bn2.", "conv3.", "bn3.")):
            src = k
        elif k.startswith("conv5."):
            src = k.replace("conv5.", "conv4.")
        elif k.startswith("bn5."):
            src = k.replace("bn5.", "bn4.")
        else:
            continue  # blocks 4-11, 13-19, bn4, conv4 have no cadene source here
        w = v.numpy()
        if "pointwise" in k:
            w = w[:, :, 0, 0]
        pre[src] = w

    model = DeepLabv3plus(n_classes=3, output_stride=16, dtype=jnp.float32)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 64, 96, 16), jnp.float32),
                             train=False)
    )(jax.random.PRNGKey(4))
    before = np.asarray(variables["params"]["xception"]["block5"]["sepconv0"]
                        ["depthwise"]["kernel"])
    out, n = import_pretrained_xception(pre, variables)
    assert n > 20

    px = out["params"]["xception"]
    # landed: conv1, block12 (from block11 source), block20 (from block12)
    np.testing.assert_allclose(
        px["conv1"]["kernel"],
        np.transpose(xsd["conv1.weight"].numpy(), (2, 3, 1, 0)),
    )
    # our names are 0-indexed: sepconv0 <- first rep sepconv (rep.1 after the
    # leading ReLU of a start_with_relu middle block)
    np.testing.assert_allclose(
        px["block12"]["sepconv0"]["depthwise"]["kernel"],
        np.transpose(xsd["block12.rep.1.conv1.weight"].numpy(), (2, 3, 1, 0)),
    )
    # untouched: block5 keeps its init
    np.testing.assert_array_equal(
        px["block5"]["sepconv0"]["depthwise"]["kernel"], before
    )
