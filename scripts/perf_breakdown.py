"""Component-level TPU timing for the DeepCAM model.

Times jitted sub-graphs (entry flow, middle flow, exit+ASPP, decoder, loss,
full fwd, full fwd+bwd) on real full-resolution shapes to locate the
off-roofline components worth Pallas kernels (SURVEY.md §7.2 step 5).

Run: python scripts/perf_breakdown.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/deepcam_jax_cache")
try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

sys.path.insert(0, "/root/repo")

from deepcam_tpu.models.deeplab import DeepLabv3plus  # noqa: E402
from deepcam_tpu.models.layers import (  # noqa: E402
    BatchNorm2d,
    SeparableConv2dSame,
)
from deepcam_tpu.train.losses import class_weights, weighted_ce_loss  # noqa: E402
from deepcam_tpu.utils.sync import host_sync  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2
DTYPE = jnp.bfloat16


def bench(name, fn, *args, iters=8, flops=None):
    jitted = jax.jit(fn)
    out = jitted(*args)
    host_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(*args)
    host_sync(out)
    dt = (time.perf_counter() - t0) / iters
    line = f"{name:34s} {1e3 * dt:8.2f} ms"
    if flops:
        line += f"  {flops / dt / 1e12:7.1f} TF/s"
    print(line, flush=True)
    return dt


def sep_stack(ch, h, w, n_layers, dilation=1):
    """n_layers of [relu, sepconv-same(ch->ch), bn] at (h, w) — the middle-flow
    shape class."""
    mod_defs = [
        SeparableConv2dSame(features=ch, dilation=dilation, dtype=DTYPE)
        for _ in range(n_layers)
    ]
    import flax.linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(n_layers):
                x = nn.relu(x)
                x = SeparableConv2dSame(
                    features=ch, dilation=dilation, dtype=DTYPE, name=f"s{i}"
                )(x)
                x = BatchNorm2d(dtype=DTYPE, name=f"b{i}")(x, train=False)
            return x

    m = Stack()
    x = jnp.zeros((BATCH, h, w, ch), DTYPE)
    v = m.init(jax.random.PRNGKey(0), x)
    return m, v, x


def main():
    print(f"devices: {jax.devices()}  batch={BATCH}")
    model = DeepLabv3plus(n_classes=3, dtype=DTYPE)
    x = jnp.zeros((BATCH, 768, 1152, 16), jnp.float32)
    y = jnp.zeros((BATCH, 768, 1152), jnp.int32)
    variables = jax.jit(lambda r: model.init(r, x, train=False))(
        jax.random.PRNGKey(0)
    )
    host_sync(variables)
    w = list(class_weights())

    # full forward (inference mode: no BN stat updates)
    def fwd(v, x):
        return model.apply(v, x, train=False)

    bench("full fwd (eval)", fwd, variables, x)

    def fwd_train(v, x):
        out, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
        return out

    bench("full fwd (train BN)", fwd_train, variables, x)

    def loss_fn(params, bs, x, y):
        logits, _ = model.apply(
            {"params": params, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"],
        )
        return weighted_ce_loss(logits, y, w)

    grad = jax.grad(loss_fn)
    bench(
        "full fwd+bwd", grad, variables["params"], variables["batch_stats"], x, y,
        iters=4,
    )

    # loss alone on logits
    logits = jnp.zeros((BATCH, 768, 1152, 3), jnp.float32)
    bench("loss on logits", lambda l, y: weighted_ce_loss(l, y, w), logits, y)

    # IoU metric
    from deepcam_tpu.train.metrics import compute_score

    preds = jnp.zeros((BATCH, 768, 1152), jnp.int32)
    bench("iou metric", lambda p, t: compute_score(p, t, 3), preds, y)

    # real train step (single-device mesh, shard_map + optimizer + metrics)
    from deepcam_tpu.core import mesh as meshlib
    from deepcam_tpu.train.optim import build_optimizer
    from deepcam_tpu.train.trainer import create_train_state, make_train_step

    mesh1 = meshlib.make_mesh(spatial=1, devices=jax.devices()[:1])
    tx = build_optimizer("AdamW", 1e-3, eps=1e-8, weight_decay=1e-2)
    state = create_train_state(model, variables, tx)
    step_fn = make_train_step(model, tx, w, mesh1)
    s, m = step_fn(state, x, y)
    host_sync(m["loss"])
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        s, m = step_fn(s, x, y)
    host_sync(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{'FULL train step':34s} {1e3 * dt:8.2f} ms "
          f"({BATCH / dt:5.1f} samples/s)", flush=True)

    # optimizer alone
    grads = jax.tree_util.tree_map(jnp.ones_like, s.params)

    def opt_only(opt_state, params, grads):
        import optax

        updates, new_os = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_os

    bench("optimizer (AdamW) alone", opt_only, s.opt_state, s.params, grads,
          iters=8)

    # component stacks at their real shapes
    # middle flow: 48 sepconv-same 728ch @ 48x72
    m, v, xx = sep_stack(728, 48, 72, 48)
    fl = 48 * (2 * 9 * 48 * 72 * 728 + 2 * 48 * 72 * 728 * 728) * BATCH
    bench("middle flow (48x sep728 @48x72)", lambda v, x: m.apply(v, x), v, xx,
          flops=fl)

    # entry block1-ish: 3 sepconv 128 @ 192x288
    m, v, xx = sep_stack(128, 192, 288, 3)
    fl = 3 * (2 * 9 * 192 * 288 * 128 + 2 * 192 * 288 * 128 * 128) * BATCH
    bench("entry (3x sep128 @192x288)", lambda v, x: m.apply(v, x), v, xx,
          flops=fl)

    # exit dilated convs: 3 sepconv ~1536 @ 48x72 dil2
    m, v, xx = sep_stack(1536, 48, 72, 3, dilation=2)
    fl = 3 * (2 * 9 * 48 * 72 * 1536 + 2 * 48 * 72 * 1536 * 1536) * BATCH
    bench("exit (3x sep1536 @48x72 d2)", lambda v, x: m.apply(v, x), v, xx,
          flops=fl)

    # decoder deconv3-ish: conv_transpose 256->256 @192x288 -> 384x576
    from deepcam_tpu.models.layers import ConvTranspose2d

    dc = ConvTranspose2d(features=256, dtype=DTYPE)
    xx = jnp.zeros((BATCH, 192, 288, 256), DTYPE)
    v = dc.init(jax.random.PRNGKey(0), xx)
    fl = 2 * 9 * 384 * 576 * 256 * 256 * BATCH // 4  # /4: stride-2 zeros
    bench("deconv3 256 @192->384", lambda v, x: dc.apply(v, x), v, xx, flops=fl)

    xx = jnp.zeros((BATCH, 384, 576, 256), DTYPE)
    v = dc.init(jax.random.PRNGKey(0), xx)
    dc3 = ConvTranspose2d(features=3, dtype=DTYPE)
    v3 = dc3.init(jax.random.PRNGKey(0), xx)
    bench("last_deconv 256->3 @384->768", lambda v, x: dc3.apply(v, x), v3, xx)

    # ASPP: 3 dilated 3x3 2048->256 @ 48x72
    from deepcam_tpu.models.deeplab import ASPPModule

    asp = ASPPModule(256, rate=12, dtype=DTYPE)
    xx = jnp.zeros((BATCH, 48, 72, 2048), DTYPE)
    v = asp.init(jax.random.PRNGKey(0), xx, train=False)
    fl = 2 * 9 * 48 * 72 * 2048 * 256 * BATCH
    bench("aspp 3x3 d12 2048->256 @48x72",
          lambda v, x: asp.apply(v, x, train=False), v, xx, flops=fl)


if __name__ == "__main__":
    main()
