"""Benchmark: pallas dw-wgrad kernel vs slice-form wgrad, real shapes, TPU."""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/deepcam_jax_cache")
try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from deepcam_tpu.ops.pallas.dw_wgrad import dw_wgrad_pallas  # noqa: E402
from deepcam_tpu.utils.sync import host_sync  # noqa: E402

B = 2


def slice_wgrad(x, g, stride, dilation, padding):
    n, h, w, c = x.shape
    _, oh, ow, _ = g.shape
    pb, pe = padding
    xp = jnp.pad(x, ((0, 0), (pb, pe), (pb, pe), (0, 0)))
    g32 = g.astype(jnp.float32)
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            tap = lax.slice(
                xp,
                (0, i * dilation, j * dilation, 0),
                (n, i * dilation + (oh - 1) * stride + 1,
                 j * dilation + (ow - 1) * stride + 1, c),
                (1, stride, stride, 1),
            )
            cols.append(jnp.sum(tap.astype(jnp.float32) * g32, axis=(0, 1, 2)))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def bench(name, fn, *args, iters=10):
    jitted = jax.jit(fn)
    out = jitted(*args)
    host_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    host_sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {1e3 * dt:8.3f} ms", flush=True)
    return out, dt


def main():
    rng = np.random.RandomState(0)
    for h, w, c, s, d, tag in [
        (384, 576, 128, 1, 1, "entry128 @384x576"),
        (192, 288, 256, 1, 1, "entry256 @192x288"),
        (48, 72, 728, 1, 1, "middle728 @48x72"),
        (48, 72, 1536, 1, 2, "exit1536 d2 @48x72"),
        (192, 288, 128, 2, 1, "stride2 128 @192x288"),
    ]:
        pad = (d, d) if s == 1 else (1, 1)
        x = jnp.asarray(rng.randn(B, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
        oh = (h + sum(pad) - (2 * d + 1)) // s + 1
        ow = (w + sum(pad) - (2 * d + 1)) // s + 1
        g = jnp.asarray(rng.randn(B, oh, ow, c).astype(np.float32)).astype(jnp.bfloat16)

        o1, _ = bench(f"{tag} slice", lambda x, g: slice_wgrad(x, g, s, d, pad), x, g)
        o2, _ = bench(
            f"{tag} pallas",
            lambda x, g: dw_wgrad_pallas(x, g, stride=s, dilation=d, padding=pad),
            x, g,
        )
        err = float(jnp.max(jnp.abs(o1.reshape(3, 3, c) - o2)))
        rel = err / (float(jnp.max(jnp.abs(o1))) + 1e-6)
        print(f"   max rel err {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
