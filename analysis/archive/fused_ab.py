"""Standalone TPU check of the fused sepconv kernel at model shapes.

Usage: python -u scripts/fused_ab.py [units]

Verifies numerics vs the unfused XLA composition at the middle-flow shape
(2, 48, 72, 728) and times a chain of `units` fused units fwd+bwd vs the
unfused chain (whole-chain jit, host-scalar sync — see PERF.md gotchas).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/deepcam_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from deepcam_tpu.ops.pallas.fused_sepconv import fused_sepconv
from deepcam_tpu.utils.sync import host_sync

UNITS = int(sys.argv[1]) if len(sys.argv) > 1 else 24
N, H, W, C = 2, 48, 72, 728

print("platform:", jax.devices()[0].platform, flush=True)

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(N, H, W, C), jnp.bfloat16)
dwk = jnp.asarray(0.3 * rng.randn(3, 3, C), jnp.bfloat16)
pwk = jnp.asarray((0.05 * rng.randn(C, C)), jnp.bfloat16)


def unfused(x, dwk, pwk):
    from deepcam_tpu.ops.depthwise import depthwise3x3
    from jax import lax

    h = jnp.maximum(x, 0)
    d = depthwise3x3(h, dwk[:, :, None, :], 1, 1, (1, 1))
    return lax.conv_general_dilated(
        d, pwk[None, None], (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# ---- numerics: single unit fwd + grads ----
def loss_f(x, dwk, pwk):
    return jnp.sum(fused_sepconv(x, dwk, pwk, True, 1).astype(jnp.float32) ** 2)


def loss_u(x, dwk, pwk):
    return jnp.sum(unfused(x, dwk, pwk).astype(jnp.float32) ** 2)


gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))
gu = jax.jit(jax.grad(loss_u, argnums=(0, 1, 2)))
yf = jax.jit(lambda *a: fused_sepconv(*a, True, 1))(x, dwk, pwk)
yu = jax.jit(unfused)(x, dwk, pwk)
yf32, yu32 = np.asarray(yf, np.float32), np.asarray(yu, np.float32)
scale = np.abs(yu32).max()
print("fwd max abs diff:", np.abs(yf32 - yu32).max(), "scale:", scale,
      flush=True)
assert np.abs(yf32 - yu32).max() <= 0.02 * scale + 1e-3, "FWD MISMATCH"

gfv = gf(x, dwk, pwk)
guv = gu(x, dwk, pwk)
for name, a, b in zip(("dx", "ddw", "dpw"), gfv, guv):
    a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
    s = np.abs(b32).max() + 1e-6
    rel = np.abs(a32 - b32).max() / s
    print(f"grad {name}: max rel diff {rel:.3e}", flush=True)
    assert rel < 0.03, f"GRAD MISMATCH {name}"
print("NUMERICS OK", flush=True)


# ---- timing: chain of UNITS units, fwd+bwd ----
def chain(step):
    def loss(x, dwk, pwk):
        y = x
        for _ in range(UNITS):
            y = step(y, dwk, pwk)
        return jnp.sum(y.astype(jnp.float32))

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))


def timeit(fn, *args, reps=20):
    r = fn(*args)
    host_sync(r[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    host_sync(r[0])
    return (time.perf_counter() - t0) / reps * 1e3


cf = chain(lambda x, d, p: fused_sepconv(x, d, p, True, 1))
cu = chain(lambda x, d, p: unfused(x, d, p))
tf = timeit(cf, x, dwk, pwk)
tu = timeit(cu, x, dwk, pwk)
print(f"{UNITS} units fwd+bwd: fused {tf:.2f} ms  unfused {tu:.2f} ms  "
      f"speedup {tu / tf:.2f}x", flush=True)

# fwd-only chain
def chain_f(step):
    def f(x, dwk, pwk):
        y = x
        for _ in range(UNITS):
            y = step(y, dwk, pwk)
        return y

    return jax.jit(f)


cff = chain_f(lambda x, d, p: fused_sepconv(x, d, p, True, 1))
cuf = chain_f(lambda x, d, p: unfused(x, d, p))
tff = timeit(cff, x, dwk, pwk)
tuf = timeit(cuf, x, dwk, pwk)
print(f"{UNITS} units fwd only: fused {tff:.2f} ms  unfused {tuf:.2f} ms  "
      f"speedup {tuf / tff:.2f}x", flush=True)
