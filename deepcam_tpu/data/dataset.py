"""HDF5 CAM5 dataset with reference-parity sharding & normalization.

Parity target: ``/root/reference/src/deepCam/data/cam_hdf5_dataset.py``.
Semantics reproduced exactly (SURVEY.md §2.3.5-6):

* file list = sorted ``*.h5`` in the source dir, optionally shuffled ONCE at
  construction with ``np.random.RandomState(seed)`` (seed 12345 default) —
  the epoch order then repeats (``cam_hdf5_dataset.py:38-41,77,83``);
* sharding by rank: ``allow_uneven_distribution=False`` (train) gives every
  rank ``floor(N/size)`` files and re-computes ``global_size = size * floor``
  (undersampling); ``True`` (validation) lets the LAST rank absorb the
  remainder (``cam_hdf5_dataset.py:43-65``);
* normalization: min-max to [0,1] from ``stats.h5``:
  ``scale * (data - shift)`` with ``shift = minval[channels]``,
  ``scale = 1/(maxval - minval)`` (``cam_hdf5_dataset.py:96-102,129``).

TPU-native difference: samples stay **HWC (channels-last)** — the HDF5 on-disk
layout — instead of the reference's NHWC→CHW transpose (:126), because NHWC is
the TPU conv layout.  One transpose removed from the hot path.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import h5py as h5
import numpy as np


class CamDataset:
    """Map-style dataset over a directory of ``.h5`` CAM5 files."""

    def __init__(
        self,
        source: str,
        statsfile: str,
        channels: Sequence[int],
        allow_uneven_distribution: bool = False,
        shuffle: bool = False,
        preprocess: bool = True,
        comm_size: int = 1,
        comm_rank: int = 0,
        seed: int = 12345,
        bf16_out: bool = False,
    ):
        # bf16_out: emit normalized samples directly as bfloat16 — ONE
        # fused native pass instead of fp32 normalize + a separate host
        # cast (bit-identical to the two-step form; halves sample bytes
        # through batch assembly and host→HBM transfer).  Only meaningful
        # with preprocess=True.
        self.source = source
        self.statsfile = statsfile
        self.channels = list(channels)
        self.shuffle = shuffle
        self.preprocess = preprocess
        self.comm_size = comm_size
        self.comm_rank = comm_rank
        self.allow_uneven_distribution = allow_uneven_distribution
        self.bf16_out = bf16_out

        self.all_files = sorted(
            os.path.join(source, x) for x in os.listdir(source) if x.endswith(".h5")
        )
        self.rng = np.random.RandomState(seed)
        self._init_reader()

        # probe shapes from the first local file
        with h5.File(self.files[0], "r") as fin:
            self.data_shape = fin["climate"]["data"].shape
            self.label_shape = fin["climate"]["labels_0"].shape

        # min-max normalization constants, broadcastable over HWC
        with h5.File(self.statsfile, "r") as f:
            shift = f["climate"]["minval"][self.channels]
            scale = 1.0 / (f["climate"]["maxval"][self.channels] - shift)
        self.data_shift = shift.astype(np.float32).reshape(1, 1, -1)
        self.data_scale = scale.astype(np.float32).reshape(1, 1, -1)

    def _init_reader(self):
        if self.shuffle:
            self.rng.shuffle(self.all_files)

        self.global_size = len(self.all_files)
        num_files_local = self.global_size // self.comm_size
        start_idx = self.comm_rank * num_files_local
        if self.allow_uneven_distribution:
            if self.comm_rank != self.comm_size - 1:
                end_idx = start_idx + num_files_local
            else:
                end_idx = self.global_size
            self.files = self.all_files[start_idx:end_idx]
        else:
            end_idx = start_idx + num_files_local
            self.files = self.all_files[start_idx:end_idx]
            self.global_size = self.comm_size * len(self.files)

        self.local_size = len(self.files)

    def __len__(self) -> int:
        return self.local_size

    @property
    def shapes(self):
        return self.data_shape, self.label_shape

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray, str]:
        """Returns (data[H, W, C] fp32 normalized, label[H, W] int, filename)."""
        filename = self.files[idx]
        with h5.File(filename, "r") as f:
            data = f["climate/data"][..., self.channels]
            label = f["climate/labels_0"][...]
        data = data.astype(np.float32)
        if self.preprocess:
            from ..ops import native

            if self.bf16_out:
                data = native.normalize_hwc_bf16(
                    data, self.data_shift, self.data_scale
                )
            else:
                data = native.normalize_hwc(
                    data, self.data_shift, self.data_scale
                )
        return data, label, filename
