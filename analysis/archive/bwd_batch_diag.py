"""Diagnose the batch-4 backward superlinearity (PERF.md: 354 ms vs 2x146).

Times the full fwd+bwd at batch 2 and batch 4, captures an xprof trace of
each, and prints the per-hlo_category device-time diff (via
profiling/op_table.py) plus the top ops whose time grew superlinearly
(>2.3x).  Root-causing VERDICT r1 weak #2 / next-round task 3.

Run: python -u scripts/bwd_batch_diag.py [iters]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/deepcam_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from deepcam_tpu.models.deeplab import DeepLabv3plus  # noqa: E402
from deepcam_tpu.train.losses import class_weights, weighted_ce_loss  # noqa: E402
from deepcam_tpu.utils.sync import host_sync  # noqa: E402

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
H, W, C = 768, 1152, 16

model = DeepLabv3plus(n_classes=3, output_stride=16, dtype=jnp.bfloat16)
x0 = jnp.zeros((1, H, W, C), jnp.float32)
variables = jax.jit(
    lambda r: model.init(r, x0, train=False)
)(jax.random.PRNGKey(0))
weights = list(class_weights())


def loss_fn(params, batch_stats, x, y):
    logits, _ = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=True,
        mutable=["batch_stats"],
    )
    return weighted_ce_loss(logits, y, weights)


grad_fn = jax.jit(jax.grad(loss_fn))
rng = np.random.RandomState(0)


def batch(n):
    x = jnp.asarray(rng.randn(n, H, W, C).astype(np.float32), jnp.bfloat16)
    y = jnp.asarray(rng.randint(0, 3, size=(n, H, W)).astype(np.int32))
    return x, y


times = {}
for n in (2, 4):
    x, y = batch(n)
    g = grad_fn(variables["params"], variables["batch_stats"], x, y)
    host_sync(g)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        g = grad_fn(variables["params"], variables["batch_stats"], x, y)
    host_sync(g)
    times[n] = (time.perf_counter() - t0) / ITERS
    print(f"batch {n}: fwd+bwd {1e3 * times[n]:.1f} ms", flush=True)

    logdir = f"/tmp/xprof_bwd_b{n}"
    jax.profiler.start_trace(logdir)
    for _ in range(2):
        g = grad_fn(variables["params"], variables["batch_stats"], x, y)
    host_sync(g)
    jax.profiler.stop_trace()
    print(f"trace -> {logdir}", flush=True)

print(f"\nscaling: {times[4] / times[2]:.2f}x (linear would be 2.0x)",
      flush=True)

from deepcam_tpu.profiling.op_table import (  # noqa: E402
    category_table,
    load_device_ops,
    op_table,
    per_step,
)

tabs = {}
for n in (2, 4):
    ops = load_device_ops(f"/tmp/xprof_bwd_b{n}")
    steps = max(ops.attrs["n_steps"], 2)
    tabs[n] = (
        per_step(category_table(ops), steps),
        per_step(op_table(ops), steps),
    )

print("\n== per-category device ms (b2, b4, ratio) ==")
c2, c4 = tabs[2][0], tabs[4][0]
cats = c4.join(c2, lsuffix="_b4", rsuffix="_b2", how="outer").fillna(0.0)
cats["ratio"] = cats["time_ms_b4"] / cats["time_ms_b2"].clip(lower=1e-6)
print(
    cats[["time_ms_b2", "time_ms_b4", "ratio"]]
    .sort_values("time_ms_b4", ascending=False)
    .to_string(float_format="{:.2f}".format)
)

print("\n== top ops with superlinear growth (>2.3x) ==")
o2, o4 = tabs[2][1], tabs[4][1]
j = o4.join(o2, lsuffix="_b4", rsuffix="_b2", how="inner")
j["ratio"] = j["time_ms_b4"] / j["time_ms_b2"].clip(lower=1e-6)
bad = j[j["ratio"] > 2.3].sort_values("time_ms_b4", ascending=False)
print(
    bad[["category_b4", "time_ms_b2", "time_ms_b4", "ratio"]]
    .head(25)
    .to_string(float_format="{:.3f}".format)
)
