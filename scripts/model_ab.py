"""Whole-model A/B: depthwise lowering x batch size, full fwd+bwd on TPU.

Micro-benchmarks are unusable here (each dispatch has a ~3.3 ms floor via the
relay), so all comparisons are at full-model granularity.
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

W = list(class_weights())


def bench(name, fn, *args, iters=6):
    jitted = jax.jit(fn)
    out = jitted(*args)
    host_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    host_sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {1e3 * dt:9.2f} ms", flush=True)
    return dt


def run(impl, batch):
    layers.set_depthwise_impl(impl)
    model = DeepLabv3plus(n_classes=3, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 768, 1152, 16).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 3, size=(batch, 768, 1152)).astype(np.int32))
    variables = jax.jit(lambda r: model.init(r, x[:1], train=False))(
        jax.random.PRNGKey(0)
    )
    host_sync(variables)

    def fwd(v, x):
        return model.apply(v, x, train=False)

    t_f = bench(f"[{impl} b{batch}] fwd", fwd, variables, x)

    def loss_fn(p, bs, x, y):
        logits, _ = model.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"],
        )
        return weighted_ce_loss(logits, y, W)

    g = jax.grad(loss_fn)
    t_g = bench(
        f"[{impl} b{batch}] fwd+bwd", g,
        variables["params"], variables["batch_stats"], x, y, iters=4,
    )
    print(f"[{impl} b{batch}] est samples/s: {batch / (t_g + 0.012):.1f}",
          flush=True)


def main():
    for impl in ("conv", "shifts"):
        for batch in (2, 4):
            run(impl, batch)


if __name__ == "__main__":
    main()
