"""Pallas depthwise-wgrad kernel vs reference math (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax


def _ref_wgrad(x, g, stride, dilation, padding):
    n, h, w, c = x.shape
    _, oh, ow, _ = g.shape
    pb, pe = padding
    xp = np.pad(np.asarray(x), ((0, 0), (pb, pe), (pb, pe), (0, 0)))
    g = np.asarray(g)
    dk = np.zeros((3, 3, c), np.float32)
    for i in range(3):
        for j in range(3):
            tap = xp[
                :,
                i * dilation : i * dilation + (oh - 1) * stride + 1 : stride,
                j * dilation : j * dilation + (ow - 1) * stride + 1 : stride,
                :,
            ]
            dk[i, j] = (tap.astype(np.float32) * g.astype(np.float32)).sum(
                axis=(0, 1, 2)
            )
    return dk


@pytest.mark.parametrize(
    "stride,dilation,hw",
    [(1, 1, (8, 12)), (1, 2, (8, 12)), (2, 1, (16, 12))],
)
def test_wgrad_kernel_matches_reference(stride, dilation, hw):
    from deepcam_tpu.ops.pallas.dw_wgrad import dw_wgrad_pallas

    rng = np.random.RandomState(0)
    h, w = hw
    c = 8
    pad = (dilation, dilation) if stride == 1 else (1, 1)
    x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
    oh = (h + sum(pad) - (2 * dilation + 1)) // stride + 1
    ow = (w + sum(pad) - (2 * dilation + 1)) // stride + 1
    g = jnp.asarray(rng.randn(2, oh, ow, c).astype(np.float32))

    got = np.asarray(
        dw_wgrad_pallas(
            x, g, stride=stride, dilation=dilation, padding=pad, interpret=True
        )
    )
    want = _ref_wgrad(x, g, stride, dilation, pad)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
