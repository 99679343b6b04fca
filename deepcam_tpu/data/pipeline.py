"""Host-side input pipeline: threaded readers + device prefetch.

The reference feeds each GPU from a per-process torch ``DataLoader`` with
``num_workers = min(max_inter_threads, local_batch_size)`` worker *processes*
(``train_hdf5_ddp.py:285-289``).  The TPU-native replacement is a
single-controller, per-host pipeline:

* a thread pool reads + decodes HDF5 samples ahead of the training step
  (h5py releases the GIL during I/O, so threads suffice and avoid process
  fork/IPC overhead);
* batches are assembled host-side as one contiguous array covering ALL local
  devices (``local_batch_size * n_local_devices`` samples);
* ``prefetch_to_device`` double-buffers ``jax.device_put`` with a
  ``NamedSharding`` over the mesh's data axis, so host→HBM transfer of the
  next batch overlaps the current step's compute.

Ordering parity: like the reference loader (no sampler, shuffle=False), batch
order follows the dataset's construction-time order (which the dataset
shuffled once with seed 12345 when requested) and ``drop_last=True`` drops the
trailing partial batch.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np


class DataLoader:
    """Ordered, read-ahead batch loader over a map-style dataset.

    Yields ``(data[B,H,W,C] fp32, label[B,H,W] int32, filenames tuple)``.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_workers: int = 4,
        drop_last: bool = True,
        prefetch_batches: int = 2,
        sample_transform=None,
    ):
        """``sample_transform`` (optional): applied to each
        ``(data, label, name)`` sample INSIDE the worker pool — e.g. the
        space-to-depth input reformat (``--s2d`` input feed) runs
        parallel to the HDF5 reads instead of stalling the step loop."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch_batches = max(1, prefetch_batches)
        self.sample_transform = sample_transform

    def _get(self, i):
        s = self.dataset[i]
        return self.sample_transform(s) if self.sample_transform else s

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batch_indices(self):
        n = len(self.dataset)
        idx = list(range(n))
        batches = [
            idx[i : i + self.batch_size] for i in range(0, n, self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        return batches

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, tuple]]:
        batches = self._batch_indices()
        if not batches:
            return
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            depth = self.prefetch_batches
            pending = collections.deque()

            def submit(batch):
                return [pool.submit(self._get, i) for i in batch]

            for b in batches[: depth + 1]:
                pending.append(submit(b))
            next_submit = depth + 1

            while pending:
                futures = pending.popleft()
                samples = [f.result() for f in futures]
                if next_submit < len(batches):
                    pending.append(submit(batches[next_submit]))
                    next_submit += 1
                from ..ops.native import stack_samples

                data = stack_samples([s[0] for s in samples])
                label = np.stack([s[1] for s in samples]).astype(np.int32)
                names = tuple(s[2] for s in samples)
                yield data, label, names


def prefetch_put(iterator, shardings, depth: int = 2):
    """Wrap a host batch iterator with asynchronous device placement.

    Each item is a tuple; ``item[i]`` is placed with ``shardings[i]`` (a
    ``None`` sharding passes the element through untouched — e.g. filename
    tuples).  Up to ``depth`` upcoming items are placed ahead so the
    host→HBM DMA of batch k+1 overlaps step k's compute (device_put is
    async under JAX's dispatch).

    Multi-process runs route through ``core.mesh.put_global`` so each host's
    batch becomes one SHARD of the global batch (not a conflicting "global"
    value — see put_global's docstring).
    """
    from ..core.mesh import put_global

    queue = collections.deque()

    def put(item):
        queue.append(tuple(
            el if sh is None else put_global(el, sh)
            for el, sh in zip(item, shardings)
        ))

    it = iter(iterator)
    try:
        for _ in range(depth):
            put(next(it))
    except StopIteration:
        pass

    while queue:
        item = queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield item


def prefetch_to_device(
    iterator,
    data_sharding=None,
    label_sharding=None,
    depth: int = 2,
):
    """``prefetch_put`` for the training ``(data, label, names)`` triple."""
    return prefetch_put(
        iterator, (data_sharding, label_sharding, None), depth=depth
    )
