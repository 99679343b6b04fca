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
