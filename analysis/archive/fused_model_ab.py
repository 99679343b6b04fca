"""Whole-model A/B: fused sepconv kernel vs XLA path, full fwd+bwd on TPU.

Run: python -u scripts/fused_model_ab.py [batch]
"""

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

sys.path.insert(0, "/root/repo")

from deepcam_tpu.models import layers  # noqa: E402
from deepcam_tpu.models.deeplab import DeepLabv3plus  # noqa: E402
from deepcam_tpu.train.losses import class_weights, weighted_ce_loss  # noqa: E402
from deepcam_tpu.utils.sync import host_sync  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2
W = list(class_weights())


def bench(name, fn, *args, iters=6):
    jitted = jax.jit(fn)
    t0 = time.perf_counter()
    out = jitted(*args)
    host_sync(out)
    print(f"{name:28s} first call {time.perf_counter() - t0:7.1f} s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    host_sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {1e3 * dt:9.2f} ms", flush=True)
    return dt


def run(impl):
    layers.set_sepconv_impl(impl)
    model = DeepLabv3plus(n_classes=3, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 768, 1152, 16).astype(np.float32))
    y = jnp.asarray(
        rng.randint(0, 3, size=(BATCH, 768, 1152)).astype(np.int32))
    variables = jax.jit(lambda r: model.init(r, x[:1], train=False))(
        jax.random.PRNGKey(0)
    )
    host_sync(variables)

    def loss_fn(p, bs, x, y):
        logits, _ = model.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"],
        )
        return weighted_ce_loss(logits, y, W)

    lv = jax.jit(loss_fn)(
        variables["params"], variables["batch_stats"], x, y)
    print(f"[{impl}] loss value: {float(lv):.6f}", flush=True)

    g = jax.grad(loss_fn)
    t_g = bench(f"[{impl} b{BATCH}] fwd+bwd", g,
                variables["params"], variables["batch_stats"], x, y,
                iters=4)

    def fwd(v, x):
        return model.apply(v, x, train=False)

    bench(f"[{impl} b{BATCH}] fwd", fwd, variables, x)
    print(f"[{impl} b{BATCH}] est samples/s/chip: "
          f"{BATCH / (t_g + 0.012):.2f}", flush=True)
    layers.set_sepconv_impl("auto")
    return t_g


t_xla = run("xla")
t_fused = run("fused")
print(f"\nfwd+bwd: xla {1e3 * t_xla:.1f} ms  fused {1e3 * t_fused:.1f} ms  "
      f"speedup {t_xla / t_fused:.3f}x", flush=True)
