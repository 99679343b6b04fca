"""Ablate the entry XceptionBlock to find its backward hotspot."""

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
H, W, CI, CO = 192, 288, 128, 256


class Block(nn.Module):
    """block2-shaped: relu,sep(128->256),bn,relu,sep(256->256),bn,sep_s2 + skip."""

    use_bn: bool = True
    use_dw: bool = True
    use_pw: bool = True
    use_skip: bool = True
    use_stride_sep: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        def sep(x, feat, stride, name):
            if self.use_dw:
                x = DepthwiseConv3x3(stride=stride, dtype=DT, name=f"{name}_dw")(x)
            if self.use_pw:
                x = Conv2d(feat, 1, dtype=DT, name=f"{name}_pw")(x)
            return x

        x = nn.relu(x)
        inp = x
        x = sep(x, CO, 1, "s0")
        if self.use_bn:
            x = BatchNorm2d(dtype=DT, name="bn0")(x, train)
        x = nn.relu(x)
        x = sep(x, CO, 1, "s1")
        if self.use_bn:
            x = BatchNorm2d(dtype=DT, name="bn1")(x, train)
        if self.use_stride_sep:
            x = sep(x, CO, 2, "s2")
        if self.use_skip:
            skip = Conv2d(CO, 1, stride=2 if self.use_stride_sep else 1,
                          dtype=DT, name="skip")(inp)
            if self.use_bn:
                skip = BatchNorm2d(dtype=DT, name="skipbn")(skip, train)
            x = x + skip
        return x


def bench(name, module, iters=5):
    x = jnp.asarray(np.random.RandomState(0).rand(B, H, W, CI).astype(np.float32)).astype(DT)
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
    print(f"{name:28s} fwd {1e3*tf:7.2f} ms  fwd+bwd {1e3*tg:7.2f} ms  ratio {tg/tf:4.1f}",
          flush=True)


def main():
    bench("full block", Block())
    bench("no BN", Block(use_bn=False))
    bench("no depthwise", Block(use_dw=False))
    bench("no pointwise", Block(use_pw=False))
    bench("no skip", Block(use_skip=False))
    bench("no stride sep", Block(use_stride_sep=False))


if __name__ == "__main__":
    main()
