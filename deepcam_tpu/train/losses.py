"""Loss functions.

Parity target: ``/root/reference/src/deepCam/utils/losses.py:28-52`` —
class-weighted pixel cross-entropy with a "false-positive penalty" whose mask
terms (``eq(p,1) & ne(p,1)``) are identically zero in the reference, making
the fpw_* multipliers no-ops.  We reproduce the *effective* behavior —
``mean(weight[target] * CE(logit, target))`` — and keep the inert ``fpw_1`` /
``fpw_2`` parameters for interface parity (SURVEY.md §2.3.3).

Layout: logits are NHWC ``(N, H, W, C)`` (TPU-native), labels ``(N, H, W)``
integer class ids.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# Reference magic numbers (train_hdf5_ddp.py:204-208): class pixel frequencies
# raised to loss_weight_pow (default -0.125).
CLASS_FREQUENCIES = (0.986267818390377, 0.0004578708870701058, 0.01327431072255291)
DEFAULT_LOSS_WEIGHT_POW = -0.125
FPW_1 = 2.61461122397522257612
FPW_2 = 1.71641974795896018744


def class_weights(loss_weight_pow: float = DEFAULT_LOSS_WEIGHT_POW):
    """``[f**p for f in CLASS_FREQUENCIES]`` (train_hdf5_ddp.py:206)."""
    return tuple(f ** loss_weight_pow for f in CLASS_FREQUENCIES)


def weighted_ce_loss(
    logits: jax.Array,
    labels: jax.Array,
    weight: Sequence[float],
    fpw_1: float = 0.0,
    fpw_2: float = 0.0,
) -> jax.Array:
    """Mean over all pixels of ``weight[label] * cross_entropy``.

    Matches torch ``nn.CrossEntropyLoss(weight=w, reduction='none')`` followed
    by ``torch.mean`` (losses.py:35-50).  Note torch's weighted 'none'
    reduction multiplies each pixel's NLL by ``w[target]`` and the final
    plain ``mean`` divides by the *pixel count* (not the weight sum) — we
    reproduce exactly that.  ``fpw_1``/``fpw_2`` are accepted but inert, as in
    the reference (dead-code FP mask, losses.py:41-48).
    """
    del fpw_1, fpw_2  # intentionally inert (reference dead code)
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.int32)
    n_classes = logits.shape[-1]

    # TPU layout note: any elementwise op on a (..., C=3) tensor uses 3 of
    # 128 vector lanes.  For the small class counts of this benchmark we
    # unstack the class axis and compute the log-sum-exp and the weighted
    # pick on full-width (N, H, W) slices (lane dim = W), which is ~10x
    # faster than both take_along_axis (gather) and channels-last one-hot
    # forms at (768, 1152) resolution.
    if n_classes <= 8:
        ls = [logits[..., c] for c in range(n_classes)]
        m = ls[0]
        for l in ls[1:]:
            m = jnp.maximum(m, l)
        sumexp = sum(jnp.exp(l - m) for l in ls)
        lse = m + jnp.log(sumexp)
        weighted_nll = jnp.zeros_like(lse)
        for c, l in enumerate(ls):
            mask = (labels == c).astype(jnp.float32)
            weighted_nll = weighted_nll + mask * (float(weight[c]) * (lse - l))
        return jnp.mean(weighted_nll)

    # general fallback: fused one-hot contraction (gather-free)
    w = jnp.asarray(weight, dtype=jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    classes = jax.lax.broadcasted_iota(jnp.int32, logp.shape, logp.ndim - 1)
    onehot = (labels[..., None] == classes).astype(jnp.float32)
    weighted_nll = -jnp.sum(onehot * (w * logp), axis=-1)
    return jnp.mean(weighted_nll)


# Alias mirroring the reference's public name.
fp_loss = weighted_ce_loss
