"""Probe pl.Element windows: overlapping in-bounds H starts (host-padded
input, no window padding) — the shape the fused sepconv kernel needs.
Run plain (TPU) or with --cpu (interpret mode)."""
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/deepcam_jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

INTERPRET = "--cpu" in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

N, H, W, C = 2, 16, 72, 728
TH, D = 4, 1
NHT = H // TH
HP = H + 2 * D

xp = jnp.asarray(np.random.RandomState(0).randn(N, HP, W, C), jnp.float32)


def kernel(x_ref, o_ref):
    o_ref[0, 0] = x_ref[0]


out = pl.pallas_call(
    kernel,
    grid=(N, NHT),
    in_specs=[
        pl.BlockSpec(
            (pl.Element(1), pl.Element(TH + 2 * D), pl.Element(W),
             pl.Element(C)),
            lambda ni, hi: (ni, hi * TH, 0, 0),
        ),
    ],
    out_specs=pl.BlockSpec(
        (1, 1, TH + 2 * D, W, C),
        lambda ni, hi: (ni, hi, 0, 0, 0),
    ),
    out_shape=jax.ShapeDtypeStruct((N, NHT, TH + 2 * D, W, C), jnp.float32),
    interpret=INTERPRET,
)(xp)

out = np.asarray(out)
xn = np.asarray(xp)
bad = 0
for ni in range(N):
    for hi in range(NHT):
        for r in range(TH + 2 * D):
            if not np.allclose(out[ni, hi, r], xn[ni, hi * TH + r]):
                bad += 1
print("row mismatches:", bad, "->", "OK" if bad == 0 else "FAIL")
