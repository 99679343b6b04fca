"""Tests for offline tools (split_data, summarize_data) and the visualizer."""

import os

import h5py as h5
import numpy as np

from deepcam_tpu.data.synthetic import make_synthetic_dataset
from deepcam_tpu.tools.split_data import split_data
from deepcam_tpu.tools.summarize_data import create_token, merge_token, summarize


def _make_flat_h5_dir(path, n=10, shape=(8, 12, 4), seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(path, exist_ok=True)
    for i in range(n):
        with h5.File(os.path.join(path, f"data-2005-01-{i:02d}-1-0.h5"), "w") as f:
            f.create_dataset("climate/data", data=rng.randn(*shape).astype(np.float32))
            f.create_dataset("climate/labels_0", data=rng.randint(0, 3, shape[:2]))
    return path


def test_split_data_fractions_and_determinism(tmp_path):
    src = _make_flat_h5_dir(str(tmp_path / "all"), n=10)
    out1 = str(tmp_path / "split1")
    out2 = str(tmp_path / "split2")
    c1 = split_data(src, out1)
    c2 = split_data(src, out2)
    assert c1 == {"train": 8, "validation": 1, "test": 1}
    # deterministic (seed 12345, parity with split_data.py:33)
    for split in ("train", "validation", "test"):
        assert sorted(os.listdir(os.path.join(out1, split))) == sorted(
            os.listdir(os.path.join(out2, split))
        )
    # symlinks, not copies
    some = os.path.join(out1, "train", os.listdir(os.path.join(out1, "train"))[0])
    assert os.path.islink(some)


def test_split_data_ignores_non_data_h5(tmp_path):
    """A stray stats.h5 in the input dir must not be split into the dataset
    (reference filter: split_data.py:39 startswith("data") and .h5)."""
    src = _make_flat_h5_dir(str(tmp_path / "all"), n=10)
    with h5.File(os.path.join(src, "stats.h5"), "w") as f:
        f.create_dataset("climate/minval", data=np.zeros(4, np.float32))
    out = str(tmp_path / "split")
    counts = split_data(src, out)
    assert counts == {"train": 8, "validation": 1, "test": 1}
    for split in ("train", "validation", "test"):
        assert all(
            n.startswith("data") for n in os.listdir(os.path.join(out, split))
        )


def test_summarize_matches_global_stats(tmp_path):
    src = _make_flat_h5_dir(str(tmp_path / "train"), n=6, shape=(8, 12, 4))
    out = str(tmp_path / "stats.h5")
    summarize(src, out, num_workers=3)

    # global ground truth over all files
    alldata = []
    for fn in sorted(os.listdir(src)):
        with h5.File(os.path.join(src, fn), "r") as f:
            alldata.append(f["climate/data"][...])
    stacked = np.stack(alldata)

    with h5.File(out, "r") as f:
        mean = f["climate/mean"][...]
        sqmean = f["climate/sqmean"][...]
        minval = f["climate/minval"][...]
        maxval = f["climate/maxval"][...]
        count = f["climate/count"][...]

    np.testing.assert_allclose(mean, stacked.mean(axis=(0, 1, 2)), rtol=1e-5)
    np.testing.assert_allclose(
        sqmean, (stacked.astype(np.float64) ** 2).mean(axis=(0, 1, 2)), rtol=1e-5
    )
    np.testing.assert_allclose(minval, stacked.min(axis=(0, 1, 2)))
    np.testing.assert_allclose(maxval, stacked.max(axis=(0, 1, 2)))
    assert count[0] == stacked[..., 0].size


def test_merge_token_associative():
    rng = np.random.RandomState(0)
    toks = []
    for _ in range(3):
        c = np.full(4, 96.0)
        m = rng.randn(4)
        s = rng.rand(4) + 1
        toks.append((c, m, s, m - 1, m + 1))
    left = merge_token(merge_token(toks[0], toks[1]), toks[2])
    right = merge_token(toks[0], merge_token(toks[1], toks[2]))
    for a, b in zip(left, right):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_visualizer_writes_png(tmp_path):
    from deepcam_tpu.obs.visualizer import CamVisualizer, parse_cam_filename

    assert parse_cam_filename("data-2005-03-14-02-1.h5") == (2005, 3, 14, 2, 1)
    viz = CamVisualizer()
    rng = np.random.RandomState(0)
    data = rng.rand(32, 48).astype(np.float32)
    pred = rng.randint(0, 3, (32, 48))
    label = rng.randint(0, 3, (32, 48))
    out = str(tmp_path / "viz.png")
    viz.plot("data-2005-03-14-02-1.h5", out, data, pred, label)
    assert os.path.getsize(out) > 1000


def test_split_then_pipeline_integration(tmp_path):
    """split -> summarize -> CamDataset end-to-end on synthetic files."""
    src = _make_flat_h5_dir(str(tmp_path / "all"), n=10, shape=(16, 24, 16))
    out = str(tmp_path / "root")
    split_data(src, out)
    summarize(os.path.join(out, "train"), os.path.join(out, "stats.h5"))

    from deepcam_tpu.data.dataset import CamDataset

    ds = CamDataset(
        os.path.join(out, "train"), os.path.join(out, "stats.h5"),
        channels=list(range(16)),
    )
    data, label, _ = ds[0]
    assert data.shape == (16, 24, 16)
    assert 0.0 <= data.min() and data.max() <= 1.0 + 1e-6
