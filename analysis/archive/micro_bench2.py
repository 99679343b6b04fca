"""Depthwise conv forms micro-bench: grouped-conv vs shift-multiply, fwd+bwd."""

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
from deepcam_tpu.ops.depthwise import depthwise3x3_shifts  # noqa: E402
from deepcam_tpu.utils.sync import host_sync  # noqa: E402

B = 2
DT = jnp.bfloat16


def bench(name, fn, *args, iters=10):
    jitted = jax.jit(fn)
    out = jitted(*args)
    host_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    host_sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {1e3 * dt:8.3f} ms", flush=True)
    return dt


def conv_depthwise(x, k, stride=1, dilation=1, pad=(1, 1)):
    return lax.conv_general_dilated(
        x, k, (stride, stride), (pad, pad), rhs_dilation=(dilation, dilation),
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    rng = np.random.RandomState(0)
    shapes = [
        (192, 288, 128, 1, 1, "entry 128@192x288"),
        (96, 144, 256, 1, 1, "entry 256@96x144"),
        (48, 72, 728, 1, 1, "middle 728@48x72"),
        (48, 72, 1536, 1, 2, "exit 1536@48x72 d2"),
        (192, 288, 128, 2, 1, "stride2 128@192x288"),
    ]
    for h, w, c, s, d, tag in shapes:
        x = jnp.asarray(rng.randn(B, h, w, c).astype(np.float32)).astype(DT)
        k = jnp.asarray(rng.randn(3, 3, 1, c).astype(np.float32)).astype(DT)
        pad = (d, d)
        a = bench(f"{tag} conv fwd", lambda x, k: conv_depthwise(x, k, s, d, pad), x, k)
        b = bench(f"{tag} shift fwd", lambda x, k: depthwise3x3_shifts(x, k, stride=s, dilation=d, padding=pad), x, k)
        # correctness
        ya = conv_depthwise(x, k, s, d, pad)
        yb = depthwise3x3_shifts(x, k, stride=s, dilation=d, padding=pad)
        err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))
        print(f"   max err {err:.2e}  speedup {a/b:.2f}x", flush=True)
        ga = jax.grad(lambda x, k: jnp.sum(conv_depthwise(x, k, s, d, pad).astype(jnp.float32)), argnums=(0, 1))
        gb = jax.grad(lambda x, k: jnp.sum(depthwise3x3_shifts(x, k, stride=s, dilation=d, padding=pad).astype(jnp.float32)), argnums=(0, 1))
        bench(f"{tag} conv bwd", ga, x, k)
        bench(f"{tag} shift bwd", gb, x, k)


if __name__ == "__main__":
    main()
