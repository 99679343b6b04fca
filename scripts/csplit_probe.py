"""Server-side compile + run probe for DEEPCAM_FUSED_CSPLIT (r5 P1).

Local AOT lowering is NOT conclusive for new kernel forms — the axon relay
compiles server-side with libtpu's own Mosaic passes and has diverged from
the local pipeline 4 recorded times (CLAUDE.md).  This probe jits the
fused-sepconv backward at each entry-flow shape ON HARDWARE, one shape per
run so a single Mosaic rejection doesn't void the rest.

Usage:  DEEPCAM_FUSED_CSPLIT=2 python -u scripts/csplit_probe.py [shape_idx]
With no arg, runs all shapes sequentially (fresh compile each ~minutes).
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

# (h, w, c, f): block1 / block2 / block3 fused-unit shapes at batch 1
SHAPES = [
    (384, 576, 64, 128),
    (384, 576, 128, 128),
    (192, 288, 128, 256),
    (192, 288, 256, 256),
    (96, 144, 256, 728),
    (96, 144, 728, 728),
]


def probe(h, w, c, f):
    from deepcam_tpu.ops.pallas.fused_sepconv import fused_sepconv_affine_stats

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, h, w, c), jnp.bfloat16)
    a = jnp.asarray(rng.randn(c), jnp.bfloat16)
    b = jnp.asarray(rng.randn(c), jnp.bfloat16)
    dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.bfloat16)
    pwk = jnp.asarray(0.3 * rng.randn(c, f), jnp.bfloat16)

    def loss(x, a, b, dwk, pwk):
        y, s1, s2 = fused_sepconv_affine_stats(x, a, b, dwk, pwk, True, 1)
        return (y.astype(jnp.float32).sum() + s1.sum() + 0.1 * s2.sum())

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    t0 = time.perf_counter()
    out = g(x, a, b, dwk, pwk)
    # host fetch is the only real sync on the relay backend
    val = float(out[0].astype(jnp.float32).sum())
    dt = time.perf_counter() - t0
    print(f"PROBE OK ({h},{w},{c},{f}) compile+run {dt:.1f}s "
          f"dx_sum={val:.3f}", flush=True)


def main():
    idxs = ([int(sys.argv[1])] if len(sys.argv) > 1
            else list(range(len(SHAPES))))
    for i in idxs:
        h, w, c, f = SHAPES[i]
        try:
            probe(h, w, c, f)
        except Exception as e:  # print the Mosaic error, keep probing
            print(f"PROBE FAIL ({h},{w},{c},{f}): {type(e).__name__}: "
                  f"{str(e)[:500]}", flush=True)


if __name__ == "__main__":
    main()
