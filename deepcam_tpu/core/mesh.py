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

import logging
import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def _distributed_client_active() -> bool:
    """True when jax.distributed.initialize() already ran (e.g. by the
    launcher or a test harness).  Reads the client handle directly —
    ``jax.process_count()`` would initialise the XLA backend as a side
    effect, which must not happen before our own initialize() call."""
    try:
        from jax._src import distributed as _jdist

        return _jdist.global_state.client is not None
    except Exception:
        # private-module layout changed: fall back (may init the backend,
        # acceptable as a last resort)
        return jax.process_count() > 1


def _multiworker_env() -> bool:
    """A MULTI-process launch is indicated: explicit coordinator env vars,
    or a multi-entry TPU worker list.  Single-worker TPU VMs also set
    TPU_WORKER_HOSTNAMES (one hostname) — single-process runs must not
    attempt distributed wireup on its account."""
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        return True
    if "COORDINATOR_ADDRESS" in os.environ:
        return True
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return "," in hosts


def init_distributed(wireup_method: str = "auto") -> None:
    """Multi-host wireup.  ``auto`` initializes jax.distributed only when a
    multi-process environment is detected (coordinator env vars present) and
    logs loudly if that fails; ``jax`` *requires* successful wireup and
    raises otherwise (parity: the reference's comm.init fails loudly too,
    ``comm.py:64-113`` — a half-wired pod silently training N independent
    models is the worst failure mode).  ``dummy`` never initializes — the
    parity analogue of comm.init's degenerate single-rank path."""
    if wireup_method == "dummy":
        return
    # Do NOT probe jax.process_count() here: it initializes the XLA
    # backend, after which jax.distributed.initialize() ALWAYS fails
    # ("must be called before any JAX calls...") — the latent form of the
    # half-wired-pod failure this function exists to prevent.  Check the
    # distributed client directly (no backend side effect).
    if _distributed_client_active():
        return
    if wireup_method == "auto" and not _multiworker_env():
        return
    try:
        jax.distributed.initialize()
    except Exception as e:
        if wireup_method == "jax":
            raise RuntimeError(
                "--wireup_method jax requested but jax.distributed."
                f"initialize() failed: {e}"
            ) from e
        # auto: fall back to single-process, but say so loudly — the env
        # vars suggested a multi-process launch.
        logger.warning(
            "init_distributed(auto): coordinator env vars present but "
            "jax.distributed.initialize() failed (%s); continuing "
            "SINGLE-process. If this is a pod run, fix the wireup.", e
        )


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


def put_global(array, sharding: NamedSharding):
    """Place a HOST-LOCAL numpy batch as a global sharded array.

    Single-process: a plain (async) ``jax.device_put``.  Multi-process: each
    process contributes its local shard and
    ``jax.make_array_from_process_local_data`` assembles the global array
    (global batch = sum of per-host batches).  Feeding a NamedSharding that
    spans processes straight through ``device_put`` would instead interpret
    the local batch as the ENTIRE global array — silently shrinking the
    global batch to one host's worth (parity hazard vs the reference's
    per-rank DistributedSampler feed, ``train_hdf5_ddp.py:280-293``).
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, array)
    return jax.device_put(array, sharding)


def local_device_count() -> int:
    return jax.local_device_count()
