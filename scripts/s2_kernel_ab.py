"""Standalone hardware A/B + parity for the fused stride-2 sepconv kernel
(ops/pallas/fused_sepconv_s2.py) at the three XceptionBlock tail shapes.

Small graphs → fast compiles; run this BEFORE the full-model A/B to catch
Mosaic lowering issues cheaply.  Timing via host-scalar sync (the axon
relay's block_until_ready does not wait).

Run: python -u scripts/s2_kernel_ab.py
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/deepcam_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from deepcam_tpu.models.layers import conv2d  # noqa: E402
from deepcam_tpu.ops.pallas.fused_sepconv_s2 import (  # noqa: E402
    fused_sepconv_s2_affine,
)

# (N, H, W, C) tail shapes at bench batch 4
SHAPES = [
    (4, 384, 576, 128),
    (4, 192, 288, 256),
    (4, 96, 144, 728),
]
REPS = 30


def _ref(x, a, b, dwk, pwk):
    u = x * a.reshape(1, 1, 1, -1) + b.reshape(1, 1, 1, -1)
    y = conv2d(u, dwk[:, :, None, :], stride=2, padding=((1, 1), (1, 1)),
               groups=x.shape[-1])
    return conv2d(y, pwk[None, None], padding=0)


def bench(fn, args):
    val_grad = jax.jit(jax.value_and_grad(
        lambda *a: jnp.sum(fn(*a) ** 2), argnums=(0, 1, 2, 3, 4)))
    v, g = val_grad(*args)
    float(v)  # sync
    t0 = time.perf_counter()
    for _ in range(REPS):
        v, g = val_grad(*args)
    float(v)
    return (time.perf_counter() - t0) / REPS * 1e3, v, g


def main():
    for n, h, w, c in SHAPES:
        rng = np.random.RandomState(c)
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
        a = jnp.asarray(rng.rand(c) + 0.5, jnp.bfloat16)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.bfloat16)
        dwk = jnp.asarray(rng.randn(3, 3, c) * 0.2, jnp.bfloat16)
        pwk = jnp.asarray(rng.randn(c, c) * 0.1, jnp.bfloat16)

        def fused(x, a, b, dwk, pwk):
            return fused_sepconv_s2_affine(x, a, b, dwk, pwk, False)

        t_f, v_f, g_f = bench(fused, (x, a, b, dwk, pwk))
        t_r, v_r, g_r = bench(_ref, (x, a, b, dwk, pwk))
        rel = abs(float(v_f) - float(v_r)) / max(abs(float(v_r)), 1e-9)
        gmax = max(
            float(jnp.max(jnp.abs(gf.astype(jnp.float32)
                                  - gr.astype(jnp.float32))))
            / max(float(jnp.max(jnp.abs(gr.astype(jnp.float32)))), 1e-9)
            for gf, gr in zip(g_f, g_r)
        )
        print(f"shape {(n, h, w, c)}: fused {t_f:.2f} ms, xla {t_r:.2f} ms, "
              f"speedup {t_r / t_f:.3f}x | loss rel {rel:.2e}, "
              f"grad max-rel {gmax:.2e}", flush=True)


if __name__ == "__main__":
    main()
