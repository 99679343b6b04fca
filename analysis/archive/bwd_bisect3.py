"""Entry-flow backward timing at real resolutions."""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/deepcam_jax_cache")
try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from deepcam_tpu.models.layers import BatchNorm2d, Conv2d  # noqa: E402
from deepcam_tpu.models.xception import XceptionBlock  # noqa: E402
from deepcam_tpu.utils.sync import host_sync  # noqa: E402

B = 2
DT = jnp.bfloat16


class EntryConvs(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        x = Conv2d(32, 3, stride=2, padding=1, dtype=DT, name="conv1")(x)
        x = BatchNorm2d(dtype=DT, name="bn1")(x, train)
        x = nn.relu(x)
        x = Conv2d(64, 3, stride=1, padding=1, dtype=DT, name="conv2")(x)
        x = BatchNorm2d(dtype=DT, name="bn2")(x, train)
        return nn.relu(x)


class EntryBlocks(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        x = XceptionBlock(128, reps=2, stride=2, start_with_relu=False,
                          dtype=DT, name="block1")(x, train)
        x = XceptionBlock(256, reps=2, stride=2, dtype=DT, name="block2")(x, train)
        x = XceptionBlock(728, reps=2, stride=2, is_last=True, dtype=DT,
                          name="block3")(x, train)
        return x


def bench(name, module, x, iters=5):
    v = jax.jit(lambda r: module.init(r, x))(jax.random.PRNGKey(0))
    host_sync(v)

    def apply_fn(v, x):
        out, _ = module.apply(v, x, True, mutable=["batch_stats"])
        return out

    fwd = jax.jit(apply_fn)
    o = fwd(v, x); host_sync(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fwd(v, x)
    host_sync(o)
    tf = (time.perf_counter() - t0) / iters

    g = jax.jit(jax.grad(lambda v, x: jnp.sum(apply_fn(v, x).astype(jnp.float32) ** 2)))
    gr = g(v, x); host_sync(gr)
    t0 = time.perf_counter()
    for _ in range(iters):
        gr = g(v, x)
    host_sync(gr)
    tg = (time.perf_counter() - t0) / iters
    print(f"{name:30s} fwd {1e3*tf:7.2f} ms  fwd+bwd {1e3*tg:7.2f} ms  ratio {tg/tf:4.1f}",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, 768, 1152, 16).astype(np.float32))
    bench("entry convs @768x1152", EntryConvs(), x)
    x2 = jnp.asarray(rng.rand(B, 384, 576, 64).astype(np.float32)).astype(DT)
    bench("entry blocks 1-3 @384x576", EntryBlocks(), x2)


if __name__ == "__main__":
    main()
