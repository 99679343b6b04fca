"""Small-class-count prediction ops in lane-efficient layout.

``jnp.argmax(logits, -1)`` on a (N, H, W, 3) tensor runs the comparison
network on 3/128 vector lanes.  For the benchmark's 3 classes we compute the
argmax from full-width (N, H, W) channel slices instead (lane dim = W).
Tie-breaking matches ``jnp.argmax``/torch: the first maximal index wins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def argmax_channels(logits: jax.Array, max_unrolled: int = 8) -> jax.Array:
    """argmax over the trailing channel axis, returned as int32 (N, H, W)."""
    c = logits.shape[-1]
    if c > max_unrolled:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    best_val = logits[..., 0]
    best_idx = jnp.zeros(logits.shape[:-1], jnp.int32)
    for j in range(1, c):
        lj = logits[..., j]
        take = lj > best_val  # strict: ties keep the earlier index
        best_val = jnp.where(take, lj, best_val)
        best_idx = jnp.where(take, jnp.int32(j), best_idx)
    return best_idx
