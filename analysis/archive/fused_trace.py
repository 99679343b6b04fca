"""Capture an xprof trace of the fused-kernel train step and print the
per-category / top-op tables (via profiling/op_table.py).

Run: python -u scripts/fused_trace.py [logdir]
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/deepcam_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from deepcam_tpu.models import layers  # noqa: E402
from deepcam_tpu.models.deeplab import DeepLabv3plus  # noqa: E402
from deepcam_tpu.train.losses import class_weights, weighted_ce_loss  # noqa: E402
from deepcam_tpu.utils.sync import host_sync  # noqa: E402

LOGDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_fused"
BATCH = 2
W = list(class_weights())

layers.set_sepconv_impl("fused")
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


g = jax.jit(jax.grad(loss_fn))
out = g(variables["params"], variables["batch_stats"], x, y)
host_sync(out)
t0 = time.perf_counter()
for _ in range(4):
    out = g(variables["params"], variables["batch_stats"], x, y)
host_sync(out)
print(f"fwd+bwd {(time.perf_counter() - t0) / 4 * 1e3:.2f} ms", flush=True)

jax.profiler.start_trace(LOGDIR)
for _ in range(3):
    out = g(variables["params"], variables["batch_stats"], x, y)
host_sync(out)
jax.profiler.stop_trace()
print(f"trace -> {LOGDIR}", flush=True)

from deepcam_tpu.profiling.op_table import (  # noqa: E402
    category_table,
    load_device_ops,
    op_table,
    per_step,
)

ops = load_device_ops(LOGDIR)
steps = max(ops.attrs["n_steps"], 3)
import pandas as pd  # noqa: E402

with pd.option_context("display.width", 200,
                       "display.float_format", "{:.3f}".format):
    print(per_step(category_table(ops), steps).to_string())
    print()
    print(per_step(op_table(ops, top=25), steps).to_string())
