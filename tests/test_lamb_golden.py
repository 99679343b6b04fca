"""Golden update-math test: our LAMB vs apex FusedLAMB semantics.

The reference trains its large-batch configs with apex FusedLAMB
(``/root/reference/src/deepCam/train_hdf5_ddp.py:217-218``,
``FusedLAMB(net.parameters(), lr, eps, weight_decay)`` — every other knob at
its default).  apex is CUDA-only, so the oracle here is a straight numpy
port of ``apex/csrc/multi_tensor_lamb.cu`` at those defaults:

* ``max_grad_norm=1.0``: grads are pre-scaled by
  ``1 / max(1, global_grad_norm)`` (global L2 norm over ALL tensors) —
  a default optax.lamb does NOT have, which is why train/optim.py chains
  ``clip_by_global_norm(1.0)`` in front;
* ``grad_averaging=True``: m = b1*m + (1-b1)*g;
* ``bias_correction=True``: m_hat = m/(1-b1^t), v_hat = v/(1-b2^t);
* ``adam_w_mode=True`` (decoupled): update = m_hat/(sqrt(v_hat)+eps) + wd*p;
* trust ratio per tensor: ratio = ||p|| / ||update|| when both norms are
  nonzero else 1; p -= lr * ratio * update.  (With ``use_nvlamb=False``
  tensors in a wd==0 param group would skip the ratio, but the reference
  puts every param in one wd!=0 group, so that branch never triggers.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from deepcam_tpu.train.optim import build_optimizer


def apex_lamb_step(params, grads, m, v, step, *, lr, b1=0.9, b2=0.999,
                   eps=1e-8, wd=1e-6, max_grad_norm=1.0):
    """One FusedLAMB update at apex defaults (numpy, fp64)."""
    gnorm = np.sqrt(sum(float(np.sum(g * g)) for g in grads.values()))
    scale = max(1.0, gnorm / max_grad_norm)
    out_p, out_m, out_v = {}, {}, {}
    bc1 = 1.0 - b1 ** step
    bc2 = 1.0 - b2 ** step
    for k in params:
        g = grads[k] / scale
        mk = b1 * m[k] + (1.0 - b1) * g
        vk = b2 * v[k] + (1.0 - b2) * g * g
        m_hat = mk / bc1
        v_hat = vk / bc2
        update = m_hat / (np.sqrt(v_hat) + eps) + wd * params[k]
        wn = np.sqrt(np.sum(params[k] ** 2))
        un = np.sqrt(np.sum(update ** 2))
        ratio = wn / un if (wn > 0 and un > 0) else 1.0
        out_p[k] = params[k] - lr * ratio * update
        out_m[k], out_v[k] = mk, vk
    return out_p, out_m, out_v


@pytest.mark.parametrize("grad_scale", [0.01, 5.0])  # below / above the clip
def test_lamb_matches_apex_fusedlamb(grad_scale):
    rng = np.random.RandomState(0)
    shapes = {"w": (5, 7), "b": (7,), "k": (3, 3, 4)}
    params_np = {k: rng.randn(*s) for k, s in shapes.items()}
    m_np = {k: np.zeros(s) for k, s in shapes.items()}
    v_np = {k: np.zeros(s) for k, s in shapes.items()}

    lr, eps, wd = 0.02, 1e-8, 1e-6
    opt = build_optimizer("LAMB", lr, eps=eps, weight_decay=wd)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), params_np)
    state = opt.init(params)

    for step in range(1, 6):
        grads_np = {k: grad_scale * rng.randn(*s).astype(np.float64)
                    for k, s in shapes.items()}
        grads = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), grads_np)

        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)

        params_np, m_np, v_np = apex_lamb_step(
            params_np, grads_np, m_np, v_np, step, lr=lr, eps=eps, wd=wd)

        for k in shapes:
            np.testing.assert_allclose(
                np.asarray(params[k], np.float64), params_np[k],
                rtol=2e-5, atol=2e-6,
                err_msg=f"step {step} tensor {k} (grad_scale {grad_scale})",
            )


def test_lamb_trust_ratio_safe_at_zero_param():
    """Zero-norm tensors fall back to ratio 1 (apex: wn>0 && un>0 guard)."""
    opt = build_optimizer("LAMB", 0.1, eps=1e-8, weight_decay=1e-6)
    params = {"z": jnp.zeros((4,))}
    state = opt.init(params)
    updates, _ = opt.update({"z": jnp.ones((4,)) * 0.1}, state, params)
    new = optax.apply_updates(params, updates)["z"]
    assert np.all(np.isfinite(np.asarray(new)))
    assert not np.allclose(np.asarray(new), 0.0)  # ratio-1 step was taken
