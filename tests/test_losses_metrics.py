"""Loss and metric golden tests vs hand computations and torch."""

import jax.numpy as jnp
import numpy as np
import torch

from deepcam_tpu.train.losses import (
    class_weights,
    weighted_ce_loss,
)
from deepcam_tpu.train.metrics import compute_score, confusion_matrix, per_sample_iou


def test_class_weights_magic_numbers():
    w = class_weights(-0.125)
    ref = [
        0.986267818390377 ** -0.125,
        0.0004578708870701058 ** -0.125,
        0.01327431072255291 ** -0.125,
    ]
    np.testing.assert_allclose(w, ref, rtol=0)


def test_weighted_ce_matches_torch():
    rng = np.random.RandomState(0)
    n, h, w_, c = 2, 6, 9, 3
    logits = rng.randn(n, h, w_, c).astype(np.float32)
    labels = rng.randint(0, c, size=(n, h, w_))
    weight = list(class_weights())

    loss = float(
        weighted_ce_loss(jnp.asarray(logits), jnp.asarray(labels), weight, 2.6, 1.7)
    )

    crit = torch.nn.CrossEntropyLoss(
        weight=torch.tensor(weight, dtype=torch.float32), reduction="none"
    )
    logits_t = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)).copy())
    losses_t = crit(logits_t, torch.from_numpy(labels).long())
    loss_t = float(losses_t.mean())
    np.testing.assert_allclose(loss, loss_t, rtol=1e-5)


def test_confusion_matrix_hand_values():
    pred = jnp.asarray([[0, 1, 2, 2], [1, 1, 0, 0]])
    gt = jnp.asarray([[0, 1, 1, 2], [2, 1, 0, 1]])
    cm = np.asarray(confusion_matrix(pred, gt, 3))
    # rows=gt, cols=pred
    expected = np.array([[2, 0, 0], [1, 2, 1], [0, 1, 1]], dtype=np.float32)
    np.testing.assert_array_equal(cm, expected)


def test_iou_reference_semantics():
    # one class absent from both pred and gt -> IoU 1.0 for that class
    pred = jnp.asarray([[0, 0, 1, 1]])
    gt = jnp.asarray([[0, 1, 1, 0]])
    # class0: tp=1 fp=1 fn=1 -> 1/3 ; class1: tp=1 fp=1 fn=1 -> 1/3 ; class2: union 0 -> 1
    score = float(compute_score(pred, gt, 3))
    np.testing.assert_allclose(score, (1 / 3 + 1 / 3 + 1.0) / 3, rtol=1e-6)


def test_iou_matches_reference_formula_random():
    """Check against a literal transcription of the tp/fp/fn definitions in
    utils.py:43-60 computed with numpy."""
    rng = np.random.RandomState(1)
    pred = rng.randint(0, 3, size=(4, 8, 8))
    gt = rng.randint(0, 3, size=(4, 8, 8))
    score = float(compute_score(jnp.asarray(pred), jnp.asarray(gt), 3))

    equal = pred == gt
    not_equal = ~equal
    ious = []
    for j in range(3):
        tp = equal[gt == j].sum()
        fp = not_equal[pred == j].sum()
        fn = not_equal[gt == j].sum()
        union = tp + fp + fn
        ious.append(1.0 if union == 0 else tp / union)
    np.testing.assert_allclose(score, np.mean(ious), rtol=1e-6)


def test_per_sample_iou_matches_loop():
    rng = np.random.RandomState(2)
    pred = rng.randint(0, 3, size=(3, 5, 7))
    gt = rng.randint(0, 3, size=(3, 5, 7))
    batched = np.asarray(per_sample_iou(jnp.asarray(pred), jnp.asarray(gt), 3))
    for i in range(3):
        single = float(compute_score(jnp.asarray(pred[i]), jnp.asarray(gt[i]), 3))
        np.testing.assert_allclose(batched[i], single, rtol=1e-6)
