"""Distributed wireup and device-mesh construction.

Replaces the reference's four torch.distributed wireup paths
(``/root/reference/src/deepCam/utils/comm.py:64-113``: nccl-openmpi,
nccl-slurm, nccl-slurm-pmi, mpi) with the JAX multi-controller runtime:
``jax.distributed.initialize`` reads coordinator/process info from TPU
metadata or env vars, and all collectives are XLA ops over a
``jax.sharding.Mesh`` — riding ICI within a slice and DCN across slices with
no NCCL/MPI anywhere.

Mesh axes:
* ``data``    — data parallelism (the reference's only strategy, SURVEY §2.4);
* ``spatial`` — optional spatial partitioning of the image height across
  chips (the sequence-parallel analogue for this CNN workload, SURVEY §5.7).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(wireup_method: str = "auto") -> None:
    """Multi-host wireup.  ``auto`` initializes jax.distributed only when a
    multi-process environment is detected (coordinator env vars present);
    single-process runs (and tests) skip it.  ``dummy`` never initializes —
    the parity analogue of comm.init's degenerate single-rank path."""
    if wireup_method == "dummy":
        return
    already = jax.process_count() > 1
    if already:
        return
    has_env = any(
        k in os.environ
        for k in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "TPU_WORKER_HOSTNAMES",
        )
    )
    if wireup_method == "auto" and not has_env:
        return
    try:
        jax.distributed.initialize()
    except Exception:
        # single-process fallback (e.g. local TPU without a coordinator)
        pass


def get_rank() -> int:
    """Process index (host rank).  Parity: ``comm.get_rank`` (comm.py:26-34)."""
    return jax.process_index()


def get_size() -> int:
    """Process count.  Parity: ``comm.get_size`` (comm.py:53-61)."""
    return jax.process_count()


def get_local_rank() -> int:
    """Rank within the host.  Parity: ``comm.get_local_rank`` (comm.py:37-50);
    with one controller process per host this is always 0."""
    return 0


def make_mesh(
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'spatial') mesh over all devices.

    ``spatial=1`` (default) is pure data parallelism.  ``spatial>1`` carves
    each data replica into a spatial-partitioning group whose members are
    ICI neighbors (contiguous device ids), keeping halo exchange off DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % spatial != 0:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}")
    arr = np.asarray(devices).reshape(n // spatial, spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for NHWC batches: N over 'data', H over 'spatial'."""
    if mesh.shape["spatial"] > 1:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def label_sharding(mesh: Mesh) -> NamedSharding:
    return batch_sharding(mesh)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_device_count() -> int:
    return jax.local_device_count()
