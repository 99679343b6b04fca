"""Whole-model A/B: BN-apply fold into the fused sepconv kernel vs the
separate BN-apply pass.  Full fwd+bwd (loss grad) on TPU.

Run: python -u scripts/bnfold_ab.py [batch]
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
    sq = sum(float(jnp.sum(l.astype(jnp.float32) ** 2))
             for l in jax.tree_util.tree_leaves(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(variables["params"], variables["batch_stats"], x, y)
    host_sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:24s} fwd+bwd {1e3 * dt:8.2f} ms  (compile {compile_s:.0f}s)"
          f"  |g| {sq ** 0.5:.6f}", flush=True)
    return dt


layers.set_bn_fold(False)
t_off = measure(f"b{BATCH} fold OFF")
layers.set_bn_fold(True)
t_on = measure(f"b{BATCH} fold ON")
print(f"\nspeedup {t_off / t_on:.3f}x", flush=True)
