"""Offline 80/10/10 train/validation/test split by symlink.

Parity target: ``/root/reference/src/utils/split_data.py:26-96`` — select
files named ``data*.h5`` (split_data.py:39 — the prefix filter keeps a
stray ``stats.h5`` in the input dir out of the dataset), shuffle with
``np.random.seed(12345)``, take 80% train / 10% validation / 10% test, and
symlink into ``{output}/{train,validation,test}``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def split_data(
    input_dir: str,
    output_dir: str,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
    seed: int = 12345,
) -> dict:
    files = sorted(
        x for x in os.listdir(input_dir)
        if x.startswith("data") and x.endswith(".h5")
    )
    np.random.seed(seed)
    perm = np.random.permutation(len(files))
    files = [files[i] for i in perm]

    n = len(files)
    n_train = int(n * train_frac)
    n_val = int(n * val_frac)
    splits = {
        "train": files[:n_train],
        "validation": files[n_train : n_train + n_val],
        "test": files[n_train + n_val :],
    }
    for split, names in splits.items():
        d = os.path.join(output_dir, split)
        os.makedirs(d, exist_ok=True)
        for name in names:
            src = os.path.abspath(os.path.join(input_dir, name))
            dst = os.path.join(d, name)
            if not os.path.lexists(dst):
                os.symlink(src, dst)
    return {k: len(v) for k, v in splits.items()}


def main():
    p = argparse.ArgumentParser(description="Split CAM5 HDF5 data by symlink")
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--train_fraction", type=float, default=0.8)
    p.add_argument("--validation_fraction", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=12345)
    args = p.parse_args()
    counts = split_data(
        args.input_dir, args.output_dir,
        args.train_fraction, args.validation_fraction, args.seed,
    )
    print(counts)


if __name__ == "__main__":
    main()
