"""Full-model structure tests: shapes, parameter counts, dtype policy.

Shapes use a small (64, 96) tile — same aspect ratio class as (768, 1152) and
divisible by 16 — so CPU tests stay fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcam_tpu.models.deeplab import DeepLabv3plus


def _param_count(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def model_and_vars():
    model = DeepLabv3plus(n_classes=3, output_stride=16, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 96, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(333), x, train=False)
    return model, variables


def test_output_shape(model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((2, 64, 96, 16), jnp.float32)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 64, 96, 3)
    assert y.dtype == jnp.float32


def test_param_count_matches_reference(model_and_vars):
    """Reference model has 56,454,440 trainable parameters for
    n_input=16, n_classes=3, os=16 (hand-derivable from the layer inventory in
    SURVEY.md §2.3.8; backbone ≈37.8M, ASPP+projections ≈15.5M, decoder ≈3.1M)."""
    _, variables = model_and_vars
    n_params = _param_count(variables["params"])
    # BN scale/bias live in params; running stats in batch_stats.
    assert 56_000_000 < n_params < 57_000_000, n_params


def test_low_level_channels_and_tap(model_and_vars):
    _, variables = model_and_vars
    params = variables["params"]
    # low-level projection consumes block1's 128 channels
    assert params["conv2"]["kernel"].shape == (1, 1, 128, 48)
    # ASPP projection consumes 5*256 = 1280 channels
    assert params["conv1"]["kernel"].shape == (1, 1, 1280, 256)
    # decoder concat 256 + 48 = 304
    assert params["upsample"]["conv0"]["kernel"].shape == (3, 3, 304, 256)
    # decoder 1x1 has a bias (torch default), last deconv has none
    assert "bias" in params["upsample"]["conv2"]
    assert "bias" not in params["upsample"]["last_deconv"]
    # middle flow blocks exist: block4..block19
    for i in range(4, 20):
        assert f"block{i}" in params["xception"]


def test_batch_stats_update(model_and_vars):
    model, variables = model_and_vars
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 96, 16), jnp.float32)
    y, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 64, 96, 3)
    # running stats must have changed
    old = variables["batch_stats"]["xception"]["bn1"]["mean"]
    new = updates["batch_stats"]["xception"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_os8_variant():
    # The deconv decoder geometrically requires stride-16 features (as in the
    # reference, which only ever runs os=16 — train_hdf5_ddp.py:199); os=8 is
    # exercised with the interpolation decoder.
    model = DeepLabv3plus(
        n_classes=3, output_stride=8, decoder="interpolation", dtype=jnp.float32
    )
    x = jnp.zeros((1, 64, 96, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 64, 96, 3)


def test_interpolation_decoder():
    model = DeepLabv3plus(n_classes=3, decoder="interpolation", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 96, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 64, 96, 3)


def test_bf16_compute_fp32_params():
    model = DeepLabv3plus(n_classes=3, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 96, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    y = model.apply(variables, x, train=False)
    assert y.dtype == jnp.float32  # logits cast back for the loss


def test_block_logits_tail_matches_fullres(monkeypatch):
    """DeconvUpsampler's block-space tail (DEEPCAM_TAIL_BLOCKS) emits the
    same logits multiset as the full-res path: factor-4 blocks of the
    full-resolution logits, bit-comparable after un-blocking."""
    import numpy as np

    from deepcam_tpu.models.deeplab import DeepLabv3plus
    from deepcam_tpu.ops.deconv import space_to_blocks

    model = DeepLabv3plus(n_classes=3, dtype=jnp.float32)
    rng = np.random.RandomState(31)
    x = jnp.asarray(rng.randn(1, 32, 48, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def run(tail):
        monkeypatch.setenv("DEEPCAM_TAIL_BLOCKS", tail)
        out, _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            block_logits=True)
        return out

    y_tail = run("1")   # (N, 8, 12, 16, 3)
    y_flat = run("0")   # (N, 16, 24, 4, 3)
    assert y_tail.shape == (1, 8, 12, 16, 3)
    assert y_flat.shape == (1, 16, 24, 4, 3)

    # un-block both to full resolution pixel order and compare
    def unblock(yb, factor):
        n, h, w, k, c = yb.shape
        f = factor
        y = yb.reshape(n, h, w, f, f, c)
        y = jnp.moveaxis(y, 3, 2)  # (n, h, f, w, f, c)
        return y.reshape(n, h * f, w * f, c)

    np.testing.assert_allclose(
        np.asarray(unblock(y_tail, 4)), np.asarray(unblock(y_flat, 2)),
        rtol=1e-4, atol=1e-4)


def test_split_concat_matches_default(monkeypatch):
    """DEEPCAM_SPLIT_CONCAT lowers conv(concat(parts)) as summed partial
    convs over slices of the SAME kernel param — identical parameter tree,
    outputs equal up to partial-sum rounding (fp32 here → tight)."""
    import numpy as np

    from deepcam_tpu.models.deeplab import DeepLabv3plus

    model = DeepLabv3plus(n_classes=3, dtype=jnp.float32)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 32, 48, 16), jnp.float32)

    def run(flag):
        monkeypatch.setenv("DEEPCAM_SPLIT_CONCAT", flag)
        variables = model.init(jax.random.PRNGKey(5), x, train=False)
        y = model.apply(variables, x, train=False)
        return variables, y

    v_split, y_split = run("1")
    v_base, y_base = run("0")
    # identical parameter trees (same paths, shapes, init values)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        v_split["params"], v_base["params"])
    # reduction-order-only deviation (measured max abs 8.8e-5 on O(1)
    # logits; rel large only at near-zeros)
    np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_base),
                               rtol=1e-3, atol=5e-4)


def test_split_concat_grads_match(monkeypatch):
    """Gradients w.r.t. the sliced kernels flow back into the single
    concat-form parameter correctly."""
    import numpy as np

    from deepcam_tpu.models.deeplab import DeepLabv3plus

    model = DeepLabv3plus(n_classes=3, dtype=jnp.float32)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 32, 48, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(5), x, train=False)

    def loss(params, flag, monkeypatch=monkeypatch):
        monkeypatch.setenv("DEEPCAM_SPLIT_CONCAT", flag)
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(out * out)

    g_split = jax.grad(lambda p: loss(p, "1"))(variables["params"])
    g_base = jax.grad(lambda p: loss(p, "0"))(variables["params"])
    for key in (("conv1",), ("upsample", "conv0")):
        a, b = g_split, g_base
        for k in key:
            a, b = a[k], b[k]
        # fp32 reduction-order noise through the deep bwd graph
        np.testing.assert_allclose(np.asarray(a["kernel"]),
                                   np.asarray(b["kernel"]),
                                   rtol=2e-3, atol=5e-3)
