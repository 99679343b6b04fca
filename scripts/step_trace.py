"""Capture an xprof trace of the FULL train step (fwd+bwd+optimizer) at the
current bench defaults and print the per-category / top-op tables.

Run: python -u scripts/step_trace.py [batch] [logdir]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/deepcam_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from deepcam_tpu.core import mesh as meshlib  # noqa: E402
from deepcam_tpu.models.deeplab import DeepLabv3plus  # noqa: E402
from deepcam_tpu.train.losses import FPW_1, FPW_2, class_weights  # noqa: E402
from deepcam_tpu.train.optim import build_optimizer  # noqa: E402
from deepcam_tpu.train.trainer import (  # noqa: E402
    create_train_state,
    make_train_step,
)
from deepcam_tpu.utils.sync import host_sync  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
LOGDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xprof_step"
TRACE_STEPS = 3

mesh = meshlib.make_mesh(spatial=1)
model = DeepLabv3plus(n_classes=3, dtype=jnp.bfloat16)
x0 = jnp.zeros((1, 768, 1152, 16), jnp.float32)
variables = jax.jit(lambda r: model.init(r, x0, train=False))(
    jax.random.PRNGKey(333))
tx = build_optimizer("AdamW", 1e-3, eps=1e-8, weight_decay=1e-2)
state = create_train_state(model, variables, tx)
del variables
state = jax.device_put(state, meshlib.replicated(mesh))

step_fn = make_train_step(
    model, tx, list(class_weights()), mesh, fpw_1=FPW_1, fpw_2=FPW_2)

rng = np.random.RandomState(0)
# host-cast bf16 feed exactly like bench.py / the production input path —
# keeps the traced graph identical to (and compile-cached with) bench's
x_np = rng.rand(BATCH, 768, 1152, 16).astype(np.float32)
from deepcam_tpu.ops.conv_small_ch import s2d_host, s2d_input_active  # noqa: E402
if s2d_input_active():
    x_np = s2d_host(x_np)
x = jnp.asarray(x_np, jnp.bfloat16)
y = jnp.asarray(rng.randint(0, 3, size=(BATCH, 768, 1152)).astype(np.int32))
x = jax.device_put(x, meshlib.batch_sharding(mesh))
y = jax.device_put(y, meshlib.batch_sharding(mesh))

for i in range(2):
    state, metrics = step_fn(state, x, y)
    float(metrics["loss"])
    print(f"warmup {i} done", flush=True)

t0 = time.perf_counter()
jax.profiler.start_trace(LOGDIR)
for _ in range(TRACE_STEPS):
    state, metrics = step_fn(state, x, y)
float(metrics["loss"])
jax.profiler.stop_trace()
print(f"traced {TRACE_STEPS} steps in {time.perf_counter() - t0:.2f}s "
      f"-> {LOGDIR}", flush=True)

import pandas as pd  # noqa: E402

from deepcam_tpu.profiling.op_table import (  # noqa: E402
    category_table,
    load_device_ops,
    op_table,
    per_step,
    scope_table,
)

ops = load_device_ops(LOGDIR)
ops.attrs["n_steps"] = TRACE_STEPS
full = per_step(op_table(ops), TRACE_STEPS)
cats = per_step(category_table(ops), TRACE_STEPS)
scopes = per_step(scope_table(ops), TRACE_STEPS)
with pd.option_context("display.width", 220, "display.max_rows", 100,
                       "display.float_format", "{:.3f}".format):
    print(f"== device time by hlo_category [per step] "
          f"(total {cats['time_ms'].sum():.2f} ms)")
    print(cats.to_string())
    print("== device time by model scope [per step]")
    print(scopes.head(40).to_string())
    print("== top ops [per step]")
    print(full.head(45).to_string())
