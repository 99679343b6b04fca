"""Micro-benchmarks: deconv variants + optimizer fusion, on TPU."""

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
import optax

sys.path.insert(0, "/root/repo")

from deepcam_tpu.models.layers import ConvTranspose2d  # noqa: E402
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
    print(f"{name:44s} {1e3 * dt:8.2f} ms", flush=True)
    return dt


def main():
    for h, w, ci, co, tag in [
        (48, 72, 256, 256, "deconv1 @48x72"),
        (96, 144, 256, 256, "deconv2 @96x144"),
        (192, 288, 256, 256, "deconv3 @192x288"),
        (384, 576, 256, 3, "last_deconv @384x576"),
    ]:
        x = jnp.zeros((B, h, w, ci), DT)
        for method in ("dilated", "polyphase"):
            m = ConvTranspose2d(features=co, dtype=DT, method=method)
            v = m.init(jax.random.PRNGKey(0), x)
            bench(f"{tag} {method} fwd", lambda v, x, m=m: m.apply(v, x), v, x)
            g = jax.grad(
                lambda v, x, m=m: jnp.sum(m.apply(v, x).astype(jnp.float32))
            )
            bench(f"{tag} {method} bwd", g, v, x)

    # optimizer variants on a realistic param tree
    from deepcam_tpu.models.deeplab import DeepLabv3plus

    model = DeepLabv3plus(n_classes=3, dtype=DT)
    x0 = jnp.zeros((1, 768, 1152, 16), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x0, train=False))(
        jax.random.PRNGKey(0)
    )
    params = variables["params"]
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    for name, tx in [
        ("adamw plain", optax.adamw(1e-3)),
        ("adamw flattened", optax.flatten(optax.adamw(1e-3))),
        ("lamb plain", optax.lamb(1e-3)),
    ]:
        opt_state = jax.jit(tx.init)(params)

        def step(os_, p, g, tx=tx):
            u, nos = tx.update(g, os_, p)
            return optax.apply_updates(p, u), nos

        bench(f"opt {name}", step, opt_state, params, grads, iters=8)


if __name__ == "__main__":
    main()
