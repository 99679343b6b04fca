"""Locate the backward-pass hotspot: grad timing per sub-network at full res."""

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

from deepcam_tpu.models.deeplab import ASPPModule, DeconvUpsampler  # noqa: E402
from deepcam_tpu.models.xception import Xception  # noqa: E402
from deepcam_tpu.utils.sync import host_sync  # noqa: E402

B = 2
DT = jnp.bfloat16


def bench_fwd_bwd(name, module, x, train_kw=True, extra=None, iters=4):
    init_args = (x,) if extra is None else (x, *extra)

    def apply_fn(v, x, *extra_args):
        if train_kw:
            out, _ = module.apply(
                v, x, *extra_args, True, mutable=["batch_stats"]
            )
        else:
            out = module.apply(v, x, *extra_args)
        return out

    variables = jax.jit(
        lambda r: module.init(r, *init_args, True)
        if train_kw
        else module.init(r, *init_args)
    )(jax.random.PRNGKey(0))
    host_sync(variables)

    args = (x,) if extra is None else (x, *extra)

    fwd = jax.jit(lambda v, *a: apply_fn(v, *a))
    out = fwd(variables, *args)
    host_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, *args)
    host_sync(out)
    tf = (time.perf_counter() - t0) / iters

    def scalar_loss(v, *a):
        out = apply_fn(v, *a)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(scalar_loss))
    gr = g(variables, *args)
    host_sync(gr)
    t0 = time.perf_counter()
    for _ in range(iters):
        gr = g(variables, *args)
    host_sync(gr)
    tg = (time.perf_counter() - t0) / iters
    print(
        f"{name:34s} fwd {1e3 * tf:8.2f} ms   fwd+bwd {1e3 * tg:8.2f} ms   "
        f"ratio {tg / tf:4.1f}",
        flush=True,
    )


class XcOnly(nn.Module):
    @nn.compact
    def __call__(self, x, train):
        f, low = Xception(output_stride=16, dtype=DT, name="x")(x, train)
        return f


class ASPPStack(nn.Module):
    @nn.compact
    def __call__(self, x, train):
        outs = [
            ASPPModule(256, rate=r, dtype=DT, name=f"a{r}")(x, train)
            for r in (1, 6, 12, 18)
        ]
        return sum(o for o in outs)


class Decoder(nn.Module):
    @nn.compact
    def __call__(self, x, low, train):
        return DeconvUpsampler(3, dtype=DT, name="up")(x, low, (768, 1152), train)


def main():
    rng = np.random.RandomState(0)
    x_img = jnp.asarray(rng.rand(B, 768, 1152, 16).astype(np.float32))
    bench_fwd_bwd("xception @768x1152x16", XcOnly(), x_img)

    feats = jnp.asarray(rng.rand(B, 48, 72, 2048).astype(np.float32)).astype(DT)
    bench_fwd_bwd("aspp x4 @48x72x2048", ASPPStack(), feats)

    dx = jnp.asarray(rng.rand(B, 48, 72, 256).astype(np.float32)).astype(DT)
    dlow = jnp.asarray(rng.rand(B, 192, 288, 48).astype(np.float32)).astype(DT)
    bench_fwd_bwd("decoder @48x72->768x1152", Decoder(), dx, extra=(dlow,))


if __name__ == "__main__":
    main()
