"""Rematerialization (--remat) path: step compiles, runs, and matches the
non-remat step numerically."""

import jax
import jax.numpy as jnp
import numpy as np

from deepcam_tpu.core import mesh as meshlib
from deepcam_tpu.models.deeplab import DeepLabv3plus
from deepcam_tpu.train.losses import class_weights
from deepcam_tpu.train.optim import build_optimizer
from deepcam_tpu.train.trainer import create_train_state, make_train_step


def test_remat_step_matches_plain():
    model = DeepLabv3plus(n_classes=3, dtype=jnp.float32)
    x0 = jnp.zeros((1, 32, 48, 16), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x0, train=False)
    host_vars = jax.device_get(variables)
    tx = build_optimizer("Adam", 1e-3)
    mesh = meshlib.make_mesh(spatial=1)
    w = list(class_weights())

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 32, 48, 16).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 3, size=(8, 32, 48)).astype(np.int32))

    losses = {}
    params = {}
    for remat in (False, True):
        vs = jax.tree_util.tree_map(jnp.asarray, host_vars)
        state = create_train_state(model, vs, tx)
        state = jax.device_put(state, meshlib.replicated(mesh))
        step = make_train_step(model, tx, w, mesh, remat=remat)
        state, metrics = step(state, x, y)
        losses[remat] = float(metrics["loss"])
        params[remat] = np.asarray(state.params["conv1"]["kernel"])

    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-6)
    np.testing.assert_allclose(params[False], params[True], rtol=1e-4, atol=1e-6)
