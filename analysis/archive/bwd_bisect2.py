"""Pinpoint encoder-backward hotspot: grad of homogeneous 24-layer stacks."""

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

from deepcam_tpu.models.layers import (  # noqa: E402
    BatchNorm2d,
    Conv2d,
    DepthwiseConv3x3,
)
from deepcam_tpu.utils.sync import host_sync  # noqa: E402

B = 2
DT = jnp.bfloat16
L = 24
C, H, W = 728, 48, 72


def make_stack(kind):
    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            for i in range(L):
                if kind == "depthwise":
                    x = DepthwiseConv3x3(dtype=DT, name=f"l{i}")(x)
                elif kind == "pointwise":
                    x = Conv2d(C, 1, dtype=DT, name=f"l{i}")(x)
                elif kind == "bn":
                    x = BatchNorm2d(dtype=DT, name=f"l{i}")(x, train)
                elif kind == "bn_relu":
                    x = nn.relu(BatchNorm2d(dtype=DT, name=f"l{i}")(x, train))
                elif kind == "sepconv_bn":
                    x = nn.relu(x)
                    x = DepthwiseConv3x3(dtype=DT, name=f"d{i}")(x)
                    x = Conv2d(C, 1, dtype=DT, name=f"p{i}")(x)
                    x = BatchNorm2d(dtype=DT, name=f"b{i}")(x, train)
            return x

    return Stack()


def bench(kind):
    m = make_stack(kind)
    x = jnp.asarray(np.random.RandomState(0).rand(B, H, W, C).astype(np.float32)).astype(DT)
    v = jax.jit(lambda r: m.init(r, x))(jax.random.PRNGKey(0))
    host_sync(v)

    def apply_fn(v, x):
        out, _ = m.apply(v, x, True, mutable=["batch_stats"])
        return out

    fwd = jax.jit(apply_fn)
    o = fwd(v, x); host_sync(o)
    t0 = time.perf_counter()
    for _ in range(6):
        o = fwd(v, x)
    host_sync(o)
    tf = (time.perf_counter() - t0) / 6

    g = jax.jit(jax.grad(lambda v, x: jnp.sum(apply_fn(v, x).astype(jnp.float32) ** 2)))
    gr = g(v, x); host_sync(gr)
    t0 = time.perf_counter()
    for _ in range(4):
        gr = g(v, x)
    host_sync(gr)
    tg = (time.perf_counter() - t0) / 4
    print(f"{kind:14s} x{L}  fwd {1e3*tf:7.2f} ms  fwd+bwd {1e3*tg:7.2f} ms  ratio {tg/tf:4.1f}",
          flush=True)


def main():
    for kind in ("pointwise", "depthwise", "bn", "bn_relu", "sepconv_bn"):
        bench(kind)


if __name__ == "__main__":
    main()
