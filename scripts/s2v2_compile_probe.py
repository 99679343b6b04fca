"""Hardware compile probe for fused_sepconv_s2_v2 — kernel-only, fast.

Compiles + executes ONE v2 fwd+bwd at each real tail shape (block1/2/3,
plain and affine) without building the whole model, so server-side Mosaic
failures (which local AOT lowering cannot catch — see CLAUDE.md) surface in
~2 min instead of a full bench compile.  Prints PROBE lines; exits nonzero
on the first failure.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/deepcam_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from deepcam_tpu.ops.pallas.fused_sepconv_s2 import (
        fused_sepconv_s2_affine_v2,
        fused_sepconv_s2_v2,
    )

    rng = np.random.RandomState(0)
    shapes = ((384, 576, 128, 128), (192, 288, 256, 256), (96, 144, 728, 728))
    n = int(os.environ.get("PROBE_BATCH", "4"))
    ok = True
    n_jobs = n_ok = 0
    for (h, w, c, f) in shapes:
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
        dwk = jnp.asarray(0.3 * rng.randn(3, 3, c), jnp.bfloat16)
        pwk = jnp.asarray(0.3 * rng.randn(c, f), jnp.bfloat16)
        a = jnp.asarray(rng.rand(c) + 0.5, jnp.bfloat16)
        b = jnp.asarray(0.1 * rng.randn(c), jnp.bfloat16)

        def loss_plain(x, d, p):
            return fused_sepconv_s2_v2(x, d, p).astype(jnp.float32).sum()

        def loss_aff(x, a, b, d, p):
            return fused_sepconv_s2_affine_v2(
                x, a, b, d, p).astype(jnp.float32).sum()

        # PROBE_STAGE bisects the r3-wave-5 finding (plain grad compiles
        # and runs; affine grad dies server-side with tpu_compile_helper
        # exit 1 and no diagnostic): "fwd" compiles the affine FORWARD
        # kernel alone — if it passes, the failure is in the affine
        # backward kernel (da/db accumulation or the second tap-split
        # chain); "bwd" compiles grad-wrt-x-only as a cheaper grad probe
        # (same kernels, smaller XLA program around them).
        stage = os.environ.get("PROBE_STAGE", "grad")
        jobs = [
            ("plain", jax.jit(jax.grad(loss_plain, argnums=(0, 1, 2))),
             (x, dwk, pwk)),
            ("affine", jax.jit(jax.grad(loss_aff, argnums=(0, 1, 2, 3, 4))),
             (x, a, b, dwk, pwk)),
        ]
        if stage == "fwd":
            jobs = [
                ("plain-fwd", jax.jit(fused_sepconv_s2_v2), (x, dwk, pwk)),
                ("affine-fwd", jax.jit(fused_sepconv_s2_affine_v2),
                 (x, a, b, dwk, pwk)),
            ]
        elif stage == "bwd":
            jobs = [
                ("affine-dx-only", jax.jit(jax.grad(loss_aff, argnums=0)),
                 (x, a, b, dwk, pwk)),
            ]
        for tag, fn, args in jobs:
            n_jobs += 1
            t0 = time.perf_counter()
            try:
                out = fn(*args)
                # fwd stage returns the output array; grad stages a tuple
                # whose [0] is dx — label accordingly so bisect logs read
                # right, and sum the WHOLE array either way.
                arr = out if stage == "fwd" else out[0]
                s = float(jnp.asarray(arr).astype(jnp.float32).sum())
                label = "out_sum" if stage == "fwd" else "dx_sum"
                dt = time.perf_counter() - t0
                n_ok += 1
                print(f"PROBE ({h},{w},{c},{f}) {tag}: OK "
                      f"({dt:.1f}s, {label}={s:.3e})", flush=True)
            except Exception as e:
                ok = False
                print(f"PROBE ({h},{w},{c},{f}) {tag}: FAIL "
                      f"{type(e).__name__}: {str(e)[:500]}", flush=True)
    # Final sentinel: queue scripts gate the FUSED_S2=2 bench arm on
    # "PROBE DONE stage=grad ok=1" so a wedged/killed partial run (or a
    # bisect-stage run) can never unlock the arm (ADVICE r3).
    print(f"PROBE DONE stage={stage} ok={int(ok)} passed={n_ok}/{n_jobs}",
          flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
