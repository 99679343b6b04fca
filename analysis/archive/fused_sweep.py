"""Sweep the fused-sepconv gating/tiling knobs at whole-model level.

Configs: (DEEPCAM_FUSED_MIN_CH, DEEPCAM_FUSED_TH) pairs; each config is a
fresh full-model compile (minutes via the relay, cached afterwards).

Run: python -u scripts/fused_sweep.py
"""

import os
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

BATCH = 2
W = list(class_weights())

model = DeepLabv3plus(n_classes=3, dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(BATCH, 768, 1152, 16).astype(np.float32))
y = jnp.asarray(rng.randint(0, 3, size=(BATCH, 768, 1152)).astype(np.int32))
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


def measure(tag, iters=4):
    g = jax.jit(jax.grad(loss_fn))
    t0 = time.perf_counter()
    out = g(variables["params"], variables["batch_stats"], x, y)
    host_sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(variables["params"], variables["batch_stats"], x, y)
    host_sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:24s} fwd+bwd {1e3 * dt:8.2f} ms  "
          f"(compile {compile_s:.0f}s)  est {BATCH / (dt + 0.012):.2f} "
          f"samples/s/chip", flush=True)
    return dt


results = {}
layers.set_sepconv_impl("xla")
results["xla"] = measure("xla")

layers.set_sepconv_impl("fused")
for min_ch, th in ((256, 8), (728, 8), (256, 16), (0, 16)):
    os.environ["DEEPCAM_FUSED_MIN_CH"] = str(min_ch)
    os.environ["DEEPCAM_FUSED_TH"] = str(th)
    results[(min_ch, th)] = measure(f"fused min_ch={min_ch} th={th}")
layers.set_sepconv_impl("auto")

best = min(results, key=results.get)
print(f"\nbest: {best}  {1e3 * results[best]:.2f} ms "
      f"(xla {1e3 * results['xla']:.2f} ms, "
      f"speedup {results['xla'] / results[best]:.3f}x)", flush=True)
