"""Full-model golden parity: our DeepLabV3+ vs the reference implementation.

Strategy (SURVEY.md §4): cross-framework RNG can't match bit-for-bit, so we
initialize OUR model, convert the parameter tree into the reference torch
model's state_dict (layout transposes only), run both on the same input, and
require logits to agree.  The reference package at /root/reference is imported
read-only for the comparison — none of its code lives in this repo.
"""

import sys

import jax
import jax.numpy as jnp
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


def _t(a, perm):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(np.asarray(a), perm)))


def conv_w(p):  # HWIO -> OIHW
    return _t(p["kernel"], (3, 2, 0, 1))


def convT_w(p):  # HWIO (kh,kw,I,O) -> torch ConvTranspose (I,O,kh,kw)
    return _t(p["kernel"], (2, 3, 0, 1))


def _load_bn(bn_t, params, stats):
    with torch.no_grad():
        bn_t.weight.copy_(torch.from_numpy(np.asarray(params["scale"])))
        bn_t.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
        bn_t.running_mean.copy_(torch.from_numpy(np.asarray(stats["mean"])))
        bn_t.running_var.copy_(torch.from_numpy(np.asarray(stats["var"])))


def _load_sep(sep_t, params):
    with torch.no_grad():
        sep_t.conv1.weight.copy_(conv_w(params["depthwise"]))
        sep_t.pointwise.weight.copy_(conv_w(params["pointwise"]))


def _load_block(block_t, p, s, ref_module):
    """Pair the torch Block.rep children with our ordered sepconvI/bnI params."""
    sep_names = [k for k in sorted(p) if k.startswith("sepconv") and k[7:].isdigit()]
    bn_names = [k for k in sorted(p) if k.startswith("bn") and k[2:].isdigit()]
    si = bi = 0
    for child in block_t.rep:
        if isinstance(child, ref_module.SeparableConv2d_same):
            if si < len(sep_names):
                _load_sep(child, p[sep_names[si]])
                si += 1
            else:  # trailing stride/is_last sepconv
                name = "sepconv_stride" if "sepconv_stride" in p else "sepconv_last"
                _load_sep(child, p[name])
        elif isinstance(child, torch.nn.BatchNorm2d):
            _load_bn(child, p[bn_names[bi]], s[bn_names[bi]])
            bi += 1
    if block_t.skip is not None:
        with torch.no_grad():
            block_t.skip.weight.copy_(conv_w(p["skip_conv"]))
        _load_bn(block_t.skipbn, p["skip_bn"], s["skip_bn"])


def load_into_reference(net, params, stats, ref_module):
    x = net.xception_features
    px, sx = params["xception"], stats["xception"]
    with torch.no_grad():
        x.conv1.weight.copy_(conv_w(px["conv1"]))
        x.conv2.weight.copy_(conv_w(px["conv2"]))
    _load_bn(x.bn1, px["bn1"], sx["bn1"])
    _load_bn(x.bn2, px["bn2"], sx["bn2"])
    for i in list(range(1, 21)):
        _load_block(getattr(x, f"block{i}"), px[f"block{i}"], sx[f"block{i}"],
                    ref_module)
    for i in (3, 4, 5):
        _load_sep(getattr(x, f"conv{i}"), px[f"conv{i}"])
        _load_bn(getattr(x, f"bn{i}"), px[f"bn{i}"], sx[f"bn{i}"])

    for i in (1, 2, 3, 4):
        aspp_t = getattr(net, f"aspp{i}")
        with torch.no_grad():
            aspp_t.atrous_convolution.weight.copy_(
                conv_w(params[f"aspp{i}"]["atrous_conv"])
            )
        _load_bn(aspp_t.bn, params[f"aspp{i}"]["bn"], stats[f"aspp{i}"]["bn"])

    with torch.no_grad():
        net.global_avg_pool[1].weight.copy_(conv_w(params["gap_conv"]))
    _load_bn(net.global_avg_pool[2], params["gap_bn"], stats["gap_bn"])

    with torch.no_grad():
        net.conv1.weight.copy_(conv_w(params["conv1"]))
        net.conv2.weight.copy_(conv_w(params["conv2"]))
    _load_bn(net.bn1, params["bn1"], stats["bn1"])
    _load_bn(net.bn2, params["bn2"], stats["bn2"])

    up, pu, su = net.upsample, params["upsample"], stats["upsample"]
    with torch.no_grad():
        up.deconv1[0].weight.copy_(convT_w(pu["deconv1"]))
        up.deconv2[0].weight.copy_(convT_w(pu["deconv2"]))
        up.deconv3[0].weight.copy_(convT_w(pu["deconv3"]))
        up.last_deconv[0].weight.copy_(convT_w(pu["last_deconv"]))
        up.conv1[0].weight.copy_(conv_w(pu["conv0"]))
        up.conv1[3].weight.copy_(conv_w(pu["conv1"]))
        up.conv1[6].weight.copy_(conv_w(pu["conv2"]))
        up.conv1[6].bias.copy_(torch.from_numpy(np.asarray(pu["conv2"]["bias"])))
    _load_bn(up.deconv1[1], pu["deconv1_bn"], su["deconv1_bn"])
    _load_bn(up.deconv2[1], pu["deconv2_bn"], su["deconv2_bn"])
    _load_bn(up.deconv3[1], pu["deconv3_bn"], su["deconv3_bn"])
    _load_bn(up.conv1[1], pu["bn0"], su["bn0"])
    _load_bn(up.conv1[4], pu["bn1"], su["bn1"])


@pytest.mark.slow
def test_full_model_logits_match_reference(ref_module):
    from deepcam_tpu.models.deeplab import DeepLabv3plus

    model = DeepLabv3plus(n_classes=3, output_stride=16, dtype=jnp.float32)
    x_np = np.random.RandomState(0).rand(1, 64, 96, 16).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(7), jnp.asarray(x_np), train=False)

    # randomize BN running stats so eval-mode normalization is non-trivial
    rng = np.random.RandomState(1)
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.rand(*a.shape).astype(np.float32) * 0.5
            + (0.75 if a.sum() > 0 else -0.25)
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    ours = np.asarray(model.apply(variables, jnp.asarray(x_np), train=False))

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

    assert ours.shape == theirs.shape
    # Eval-mode BN (running stats) does not match true activation scales at
    # random init, so magnitudes amplify to ~1e5 through 60 layers; fp
    # reduction-order differences scale with them.  Tolerate 1e-4 of the
    # output scale absolutely plus 0.2% relative.
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=1e-4 * scale)


@pytest.mark.slow
def test_full_model_train_mode_matches_reference(ref_module):
    """Train-mode forward (batch-stats path) must also agree."""
    from deepcam_tpu.models.deeplab import DeepLabv3plus

    model = DeepLabv3plus(n_classes=3, output_stride=16, dtype=jnp.float32)
    x_np = np.random.RandomState(2).rand(2, 64, 96, 16).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(9), jnp.asarray(x_np[:1]), train=False)

    ours, _ = model.apply(
        variables, jnp.asarray(x_np), train=True, mutable=["batch_stats"]
    )
    ours = np.asarray(ours)

    net = ref_module.DeepLabv3_plus(
        n_input=16, n_classes=3, os=16, pretrained=False, _print=False
    )
    load_into_reference(
        net, variables["params"], variables["batch_stats"], ref_module
    )
    net.train()
    theirs = net(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)).copy()))
    theirs = np.transpose(theirs.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, rtol=1e-2, atol=5e-3)
