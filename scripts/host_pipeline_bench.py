"""Host input-pipeline throughput: can the loader feed the chips?

Generates full-resolution (768, 1152, 16) HDF5 samples (~54 MB fp32 each),
then measures CamDataset + DataLoader throughput (read + channel select +
native normalize + batch assembly) at several reader-thread counts.  The
chip needs ~0.8 GB/s per 15 samples/s of training throughput.
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from deepcam_tpu.data.dataset import CamDataset  # noqa: E402
from deepcam_tpu.data.pipeline import DataLoader  # noqa: E402
from deepcam_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402


def main():
    root = tempfile.mkdtemp(prefix="deepcam_host_bench_")
    try:
        n = 12
        print("generating", n, "full-res samples ...", flush=True)
        make_synthetic_dataset(
            root, n_train=n, n_validation=1, shape=(768, 1152), seed=0
        )
        ds = CamDataset(
            os.path.join(root, "train"), os.path.join(root, "stats.h5"),
            channels=list(range(16)),
        )
        sample_mb = 768 * 1152 * 16 * 4 / 1e6

        # single-sample latency
        t0 = time.perf_counter()
        ds[0]
        print(f"cold single read: {time.perf_counter() - t0:.3f} s", flush=True)

        for workers in (1, 2, 4, 8):
            loader = DataLoader(ds, batch_size=2, num_workers=workers,
                                drop_last=True)
            t0 = time.perf_counter()
            count = 0
            for data, label, _ in loader:
                count += data.shape[0]
            dt = time.perf_counter() - t0
            print(
                f"workers={workers}: {count / dt:6.2f} samples/s "
                f"({count / dt * sample_mb / 1e3:.2f} GB/s)",
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
