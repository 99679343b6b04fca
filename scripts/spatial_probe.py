"""Server-side compile + run probe for the spatial-sharding kernel shapes.

The fused-kernel spatial path (parallel/spatial.py) runs the UNCHANGED
Pallas kernels on H-shards — the only new hardware risk is the kernel
compiling at the halved/quartered H extents.  One chip cannot run the
2+-device shard_map itself (the 8-device CPU-mesh tests + the realistic-
shape dryrun cover that); this probe compiles+runs the fused unit fwd+bwd
at every spatial-local H the production (768, 1152) tile produces for
s ∈ {2, 4}, on the real TPU.

Usage: python -u scripts/spatial_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/deepcam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# (h_local, w, c, f, dilation): spatial-local fused-unit shapes at s=2 / s=4
SHAPES = [
    (192, 576, 64, 128, 1),    # block1 @ s=2
    (96, 576, 64, 128, 1),     # block1 @ s=4
    (96, 288, 128, 256, 1),    # block2 @ s=2
    (48, 288, 128, 256, 1),    # block2 @ s=4
    (48, 144, 256, 728, 1),    # block3 @ s=2
    (24, 144, 256, 728, 1),    # block3 @ s=4
    (24, 72, 728, 728, 1),     # middle flow @ s=2
    (12, 72, 728, 728, 1),     # middle flow @ s=4
    (24, 72, 1024, 1536, 2),   # exit conv3 @ s=2
    (12, 72, 1024, 1536, 2),   # exit conv3 @ s=4
]


def probe(h, w, c, f, d):
    from deepcam_tpu.ops.pallas.fused_sepconv import fused_sepconv_affine_stats

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, h, w, c), jnp.bfloat16)
    a = jnp.asarray(rng.randn(c), jnp.bfloat16)
    b = jnp.asarray(rng.randn(c), jnp.bfloat16)
    dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.bfloat16)
    pwk = jnp.asarray(0.3 * rng.randn(c, f), jnp.bfloat16)

    def loss(x, a, b, dwk, pwk):
        y, s1, s2 = fused_sepconv_affine_stats(x, a, b, dwk, pwk, True, d)
        return y.astype(jnp.float32).sum() + s1.sum() + 0.1 * s2.sum()

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    t0 = time.perf_counter()
    out = g(x, a, b, dwk, pwk)
    val = float(out[0].astype(jnp.float32).sum())
    dt = time.perf_counter() - t0
    print(f"PROBE OK ({h},{w},{c},{f},d{d}) compile+run {dt:.1f}s "
          f"dx_sum={val:.3f}", flush=True)


def main():
    for shp in SHAPES:
        try:
            probe(*shp)
        except Exception as e:
            print(f"PROBE FAIL {shp}: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)


if __name__ == "__main__":
    main()
