"""Host synchronization helper.

``jax.block_until_ready`` is not a reliable execution barrier on every
backend (notably the axon TPU relay used in development, where dispatch is
fully asynchronous and only a host transfer synchronizes).  ``host_sync``
forces completion of everything a pytree depends on by fetching one scalar
element to the host.
"""

from __future__ import annotations

import jax
import numpy as np


def host_sync(tree) -> None:
    """Block until all computations feeding ``tree`` have executed."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return
    leaf = leaves[0]
    scalar = leaf if getattr(leaf, "ndim", 0) == 0 else leaf.ravel()[0]
    np.asarray(jax.device_get(scalar))
