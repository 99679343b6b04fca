"""Dataset sharding/normalization parity tests (cam_hdf5_dataset.py:38-131)."""

import numpy as np
import pytest

from deepcam_tpu.data.dataset import CamDataset
from deepcam_tpu.data.pipeline import DataLoader
from deepcam_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("camdata")
    return make_synthetic_dataset(str(root), n_train=10, n_validation=7, shape=(32, 48))


def test_even_sharding_undersamples(data_root):
    """allow_uneven_distribution=False: every rank floor(N/size) files,
    global_size recomputed (cam_hdf5_dataset.py:55-62)."""
    sets = [
        CamDataset(
            f"{data_root}/train", f"{data_root}/stats.h5", list(range(16)),
            allow_uneven_distribution=False, comm_size=3, comm_rank=r,
        )
        for r in range(3)
    ]
    for s in sets:
        assert len(s) == 3  # floor(10/3)
        assert s.global_size == 9
    files = [f for s in sets for f in s.files]
    assert len(set(files)) == 9  # disjoint shards


def test_uneven_sharding_last_rank_absorbs(data_root):
    sets = [
        CamDataset(
            f"{data_root}/validation", f"{data_root}/stats.h5", list(range(16)),
            allow_uneven_distribution=True, comm_size=3, comm_rank=r,
        )
        for r in range(3)
    ]
    assert [len(s) for s in sets] == [2, 2, 3]  # 7 files: last rank absorbs
    assert all(s.global_size == 7 for s in sets)
    files = [f for s in sets for f in s.files]
    assert sorted(files) == sorted(set(files))


def test_shuffle_once_deterministic(data_root):
    a = CamDataset(
        f"{data_root}/train", f"{data_root}/stats.h5", list(range(16)),
        shuffle=True, seed=12345,
    )
    b = CamDataset(
        f"{data_root}/train", f"{data_root}/stats.h5", list(range(16)),
        shuffle=True, seed=12345,
    )
    assert a.files == b.files  # same seed, same order
    c = CamDataset(
        f"{data_root}/train", f"{data_root}/stats.h5", list(range(16)),
        shuffle=False,
    )
    assert sorted(a.files) == c.files  # unshuffled is sorted


def test_normalization_min_max(data_root):
    ds = CamDataset(
        f"{data_root}/train", f"{data_root}/stats.h5", list(range(16)),
    )
    data, label, fname = ds[0]
    assert data.shape == (32, 48, 16)  # HWC, channels-last
    assert label.shape == (32, 48)
    assert data.dtype == np.float32
    # min-max normalized to [0, 1] over the train statistics
    assert data.min() >= -1e-5 and data.max() <= 1.0 + 1e-5
    assert fname.endswith(".h5")


def test_channel_selection(data_root):
    ds = CamDataset(
        f"{data_root}/train", f"{data_root}/stats.h5", [0, 3, 7],
    )
    data, _, _ = ds[0]
    assert data.shape == (32, 48, 3)


def test_dataloader_batching_and_order(data_root):
    ds = CamDataset(f"{data_root}/train", f"{data_root}/stats.h5", list(range(16)))
    loader = DataLoader(ds, batch_size=4, num_workers=2, drop_last=True)
    assert len(loader) == 2  # 10 files -> 2 full batches of 4
    batches = list(loader)
    assert len(batches) == 2
    names = [n for _, _, batch_names in batches for n in batch_names]
    assert names == ds.files[:8]  # ordered, trailing partial dropped
    data, label, _ = batches[0]
    assert data.shape == (4, 32, 48, 16)
    assert label.shape == (4, 32, 48)
    assert label.dtype == np.int32


def test_dataloader_keep_last(data_root):
    ds = CamDataset(f"{data_root}/validation", f"{data_root}/stats.h5", list(range(16)))
    loader = DataLoader(ds, batch_size=4, drop_last=False)
    batches = list(loader)
    assert [b[0].shape[0] for b in batches] == [4, 3]


def test_dataset_bf16_out(tmp_path):
    """bf16_out=True emits bfloat16 samples bit-identical to the fp32
    pipeline followed by the host cast."""
    import ml_dtypes

    from deepcam_tpu.data.synthetic import make_synthetic_dataset

    import os

    root = str(tmp_path / "d")
    make_synthetic_dataset(root, n_train=2, n_validation=1, shape=(16, 24))
    kw = dict(statsfile=os.path.join(root, "stats.h5"),
              channels=list(range(16)))
    ds32 = CamDataset(os.path.join(root, "train"), **kw)
    ds16 = CamDataset(os.path.join(root, "train"), bf16_out=True, **kw)
    d32, l32, n32 = ds32[0]
    d16, l16, n16 = ds16[0]
    assert d16.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        d16.view(np.uint16), d32.astype(ml_dtypes.bfloat16).view(np.uint16))
    np.testing.assert_array_equal(l16, l32)
    assert n16 == n32
