"""Validation-pass hardware benchmark (round3_plan P5 / VERDICT r2 weak #3).

The eval path had never been timed on hardware: the CLI defaults to
``--eval_local_batch_size 1`` (reference semantics: validation batch
hardcoded 1, train_hdf5_ddp.py:301-306) which through the ~3.3 ms relay
dispatch floor makes a full validation pass dispatch-bound; block-space
eval landed in r2 unmeasured.  This script times a fixed validation budget
(EVAL_SAMPLES full-res samples) through the REAL eval step — including the
per-batch host float fetch the driver performs (cli/train.py
run_validation) — across eval batch sizes and block-eval on/off.

Output: one JSON line per config, ``eval_samples_per_sec_per_chip``.

Run AFTER any training bench finishes (one chip, one client at a time):
    python -u scripts/eval_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVAL_SAMPLES = int(os.environ.get("EVAL_SAMPLES", "16"))
H = int(os.environ.get("EVAL_H", "768"))   # CPU smoke: EVAL_H=64 EVAL_W=96
W = int(os.environ.get("EVAL_W", "1152"))
CONFIGS = [
    # (eval_local_batch, block_eval)
    (1, True),
    (1, False),
    (2, True),
    (4, True),
    (4, False),
    (8, True),
]
# EVAL_CONFIGS="16:1,8:0" overrides: batch:block pairs
if os.environ.get("EVAL_CONFIGS"):
    CONFIGS = [(int(b), bool(int(e)))
               for b, e in (c.split(":")
                            for c in os.environ["EVAL_CONFIGS"].split(","))]


def main():
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/deepcam_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from deepcam_tpu.core import mesh as meshlib
    from deepcam_tpu.models.deeplab import DeepLabv3plus
    from deepcam_tpu.train.losses import FPW_1, FPW_2, class_weights
    from deepcam_tpu.train import trainer as trainerlib
    from deepcam_tpu.train.optim import build_optimizer
    from deepcam_tpu.train.trainer import create_train_state, make_eval_step

    n_chips = jax.device_count()
    mesh = meshlib.make_mesh(spatial=1)

    model = DeepLabv3plus(n_classes=3, dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, H, W, 16), jnp.float32),
                             train=False)
    )(jax.random.PRNGKey(333))
    tx = build_optimizer("AdamW", 1e-3)
    state = create_train_state(model, variables, tx)
    del variables
    state = jax.device_put(state, meshlib.replicated(mesh))

    rng = np.random.RandomState(0)
    weights = list(class_weights())

    from jax.sharding import NamedSharding, PartitionSpec as P
    data_sh = meshlib.batch_sharding(mesh)
    valid_sh = NamedSharding(mesh, P("data"))

    for eval_batch, block in CONFIGS:
        os.environ["DEEPCAM_BLOCK_EVAL"] = "1" if block else "0"
        eval_step = make_eval_step(
            model, weights, mesh, fpw_1=FPW_1, fpw_2=FPW_2
        )
        b = eval_batch * n_chips
        x = jax.device_put(
            jnp.asarray(rng.rand(b, H, W, 16).astype(np.float32),
                        jnp.bfloat16), data_sh)
        y = jax.device_put(
            jnp.asarray(rng.randint(0, 3, size=(b, H, W), dtype=np.int32)),
            data_sh)
        v = jax.device_put(jnp.ones((b,), jnp.float32), valid_sh)

        # warmup/compile (+ host sync via float fetch — block_until_ready
        # does not synchronize on the axon relay)
        c, ls, us = eval_step(state, x, y, v)
        float(c); float(ls); float(us)

        # EVAL_OVERLAP=1: the r5 driver pattern — partials stay on device,
        # ONE device_get at loop end (cli/train.py run_validation); =0
        # reproduces the old per-batch three-float fetch (~3.3 ms relay
        # dispatch floor serialized per fetch).
        overlap = os.environ.get("EVAL_OVERLAP", "0") == "1"
        n_batches = max(1, EVAL_SAMPLES // b)
        t0 = time.perf_counter()
        if overlap:
            partials = [eval_step(state, x, y, v) for _ in range(n_batches)]
            tot = sum(float(c) + float(ls) + float(us)
                      for c, ls, us in jax.device_get(partials))
        else:
            tot = 0.0
            for _ in range(n_batches):
                c, ls, us = eval_step(state, x, y, v)
                tot += float(c) + float(ls) + float(us)
        dt = time.perf_counter() - t0
        sps = n_batches * b / dt / n_chips
        print(json.dumps({
            "metric": "eval_samples_per_sec_per_chip",
            "eval_local_batch": eval_batch,
            "block_eval": block,
            "overlap": overlap,
            "value": round(sps, 3),
            "ms_per_sample": round(1000 * dt / (n_batches * b), 2),
            "batches": n_batches,
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
