"""Synthetic HDF5 fixture generator mirroring the CAM5 schema.

The reference ships no test data; its HDF5 schema is
``climate/data (H, W, 16) fp32`` + ``climate/labels_0 (H, W) int`` per file
(``cam_hdf5_dataset.py:91-92,121-123``) plus a ``stats.h5`` with per-channel
``climate/{count,mean,sqmean,minval,maxval}`` written by
``src/utils/summarize_data.py:137-145``.  This module fabricates tiny but
schema-exact datasets for tests and benchmarks.
"""

from __future__ import annotations

import os
from typing import Tuple

import h5py as h5
import numpy as np


def make_synthetic_dataset(
    root: str,
    n_train: int = 8,
    n_validation: int = 4,
    n_test: int = 0,
    shape: Tuple[int, int] = (64, 96),
    n_channels: int = 16,
    n_classes: int = 3,
    seed: int = 0,
    signal: float = 1.0,
) -> str:
    """Create ``root/{train,validation[,test]}/data-*.h5`` + ``root/stats.h5``.

    Labels are blobby (not uniform noise) so IoU is a meaningful signal.
    ``signal`` scales how strongly channel 0 encodes the label (in units of
    the unit-variance noise floor) — raise it to make the task learnable to
    a target IoU in few steps (convergence demonstrations).  Returns
    ``root``.
    """
    rng = np.random.RandomState(seed)
    h, w = shape
    os.makedirs(root, exist_ok=True)

    splits = {"train": n_train, "validation": n_validation}
    if n_test:
        splits["test"] = n_test

    all_data = []
    for split, count in splits.items():
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for i in range(count):
            data = rng.randn(h, w, n_channels).astype(np.float32)
            # low-frequency structured labels: threshold a smoothed channel
            yy, xx = np.mgrid[0:h, 0:w]
            cy, cx = rng.randint(0, h), rng.randint(0, w)
            r1 = rng.randint(max(2, h // 8), max(3, h // 3))
            r2 = rng.randint(max(2, h // 10), max(3, h // 4))
            label = np.zeros((h, w), dtype=np.int64)
            label[((yy - cy) ** 2 + (xx - cx) ** 2) < r1**2] = 1
            cy2, cx2 = rng.randint(0, h), rng.randint(0, w)
            label[((yy - cy2) ** 2 + (xx - cx2) ** 2) < r2**2] = 2
            # make the data informative about the label
            data[..., 0] += signal * label.astype(np.float32)
            fname = os.path.join(
                d, f"data-2000-{i:02d}-01-{rng.randint(0,4)}.h5"
            )
            with h5.File(fname, "w") as f:
                f.create_dataset("climate/data", data=data)
                f.create_dataset("climate/labels_0", data=label)
            if split == "train":
                all_data.append(data)

    stacked = np.stack(all_data)  # (n, h, w, c)
    with h5.File(os.path.join(root, "stats.h5"), "w") as f:
        f.create_dataset(
            "climate/count", data=np.full(n_channels, stacked[..., 0].size, np.float64)
        )
        f.create_dataset("climate/mean", data=stacked.mean(axis=(0, 1, 2)))
        f.create_dataset("climate/sqmean", data=(stacked**2).mean(axis=(0, 1, 2)))
        f.create_dataset("climate/minval", data=stacked.min(axis=(0, 1, 2)))
        f.create_dataset("climate/maxval", data=stacked.max(axis=(0, 1, 2)))
    return root
