"""Decoder-only fwd / fwd+bwd timing at real shapes (batch 4 default).

Sizes the deconv-backward prize: XLA autodiff through the dilated
(lhs_dilation) schedule emits a reverse + pad/slice/copy storm over the
(4, 384, 576, 256) fp32 intermediates (PERF.md r2 step trace).

Run: python -u scripts/decoder_bwd_ab.py [batch]
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

from deepcam_tpu.models.deeplab import DeconvUpsampler  # noqa: E402
from deepcam_tpu.utils.sync import host_sync  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
DT = jnp.bfloat16


def bench(name, fn, *args, iters=6):
    jitted = jax.jit(fn)
    out = jitted(*args)
    host_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    host_sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {1e3 * dt:8.2f} ms", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()} batch={B}", flush=True)
    rng = np.random.RandomState(0)
    # ASPP output at os=16 and the block1 low-level features
    x = jnp.asarray(rng.rand(B, 48, 72, 256).astype(np.float32), DT)
    low = jnp.asarray(rng.rand(B, 192, 288, 48).astype(np.float32), DT)

    m = DeconvUpsampler(3, dtype=DT)
    v = jax.jit(lambda r: m.init(r, x, low, (768, 1152), train=False))(jax.random.PRNGKey(0))
    host_sync(v)

    def apply_fn(v, x, low):
        out, _ = m.apply(v, x, low, (768, 1152), True, mutable=["batch_stats"])
        return out

    bench("decoder fwd", lambda v, x, low: apply_fn(v, x, low), v, x, low)

    def loss(v, x, low):
        return jnp.sum(apply_fn(v, x, low).astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))
    bench("decoder fwd+bwd", lambda v, x, low: g(v, x, low), v, x, low)


if __name__ == "__main__":
    main()
