"""Parity tests for the Pallas 3x3 full-conv wgrad (entry-conv backward).

Oracle: the slice-form einsum wgrad in ops/conv_small_ch.py (itself
golden-tested against torch autograd via the model gradients).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from deepcam_tpu.ops.pallas.conv_wgrad import conv3x3_wgrad_pallas


def _reference_wgrad(x, g, stride):
    n, h, w, ci = x.shape
    _, oh, ow, co = g.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    g32 = g.astype(jnp.float32)
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            tap = lax.slice(
                xp, (0, i, j, 0),
                (n, i + (oh - 1) * stride + 1, j + (ow - 1) * stride + 1, ci),
                (1, stride, stride, 1),
            )
            cols.append(jnp.einsum(
                "nhwc,nhwd->cd", tap.astype(jnp.float32), g32))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


CASES = [
    # (n, h, w, ci, co, stride)
    (2, 16, 12, 16, 32, 2),   # conv1 shape class (stride 2)
    (1, 16, 12, 32, 64, 1),   # conv2 shape class (stride 1)
    (2, 8, 12, 8, 8, 1),      # single row tile
    (1, 12, 10, 4, 16, 2),    # odd W, stride 2
]


@pytest.mark.parametrize("n,h,w,ci,co,stride", CASES)
def test_wgrad_parity(n, h, w, ci, co, stride):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, ci), jnp.float32)
    oh = (h + 2 - 3) // stride + 1
    ow = (w + 2 - 3) // stride + 1
    g = jnp.asarray(rng.randn(n, oh, ow, co), jnp.float32)

    got = conv3x3_wgrad_pallas(x, g, stride=stride, interpret=True)
    want = _reference_wgrad(x, g, stride)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
