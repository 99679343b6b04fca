"""Native (C++) host preprocessing kernels vs numpy reference."""

import numpy as np

from deepcam_tpu.ops import native


def test_native_lib_builds():
    # g++ is part of the baked toolchain; the lib must build here
    assert native.lib() is not None


def test_normalize_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(64, 96, 16).astype(np.float32)
    shift = rng.randn(16).astype(np.float32)
    scale = rng.rand(16).astype(np.float32) + 0.5
    got = native.normalize_hwc(x, shift, scale)
    want = scale.reshape(1, 1, -1) * (x - shift.reshape(1, 1, -1))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_normalize_fallback_without_lib(monkeypatch):
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_failed", True)
    rng = np.random.RandomState(1)
    x = rng.randn(8, 12, 4).astype(np.float32)
    shift = rng.randn(4).astype(np.float32)
    scale = rng.rand(4).astype(np.float32) + 0.5
    got = native.normalize_hwc(x, shift, scale)
    want = scale.reshape(1, 1, -1) * (x - shift.reshape(1, 1, -1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_normalize_bf16_bit_identical_to_two_step():
    """The fused native normalize+bf16 must be BIT-identical to fp32
    normalize followed by the RNE bf16 cast (the O1 host input cast)."""
    import ml_dtypes

    rng = np.random.RandomState(2)
    x = (rng.randn(64, 96, 16) * 100).astype(np.float32)
    shift = rng.randn(16).astype(np.float32)
    scale = (rng.rand(16) + 0.5).astype(np.float32)
    got = native.normalize_hwc_bf16(x, shift, scale)
    assert got.dtype == ml_dtypes.bfloat16
    want = (scale.reshape(1, 1, -1) * (x - shift.reshape(1, 1, -1))
            ).astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(got.view(np.uint16),
                                  want.view(np.uint16))


def test_normalize_bf16_fallback_without_lib(monkeypatch):
    import ml_dtypes

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_failed", True)
    rng = np.random.RandomState(3)
    x = rng.randn(8, 12, 4).astype(np.float32)
    shift = rng.randn(4).astype(np.float32)
    scale = (rng.rand(4) + 0.5).astype(np.float32)
    got = native.normalize_hwc_bf16(x, shift, scale)
    want = (scale.reshape(1, 1, -1) * (x - shift.reshape(1, 1, -1))
            ).astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(got.view(np.uint16),
                                  want.view(np.uint16))


def test_stack_samples_matches_np_stack():
    rng = np.random.RandomState(4)
    for dtype in (np.float32, np.int32):
        samples = [rng.randn(7, 5, 3).astype(dtype) for _ in range(4)]
        np.testing.assert_array_equal(
            native.stack_samples(samples), np.stack(samples))
    # bf16 samples (the production batch dtype)
    import ml_dtypes
    samples = [rng.randn(7, 5, 3).astype(ml_dtypes.bfloat16)
               for _ in range(3)]
    np.testing.assert_array_equal(
        native.stack_samples(samples).view(np.uint16),
        np.stack(samples).view(np.uint16))
