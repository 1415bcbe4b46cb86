"""Detection-loss classification supervision (CE-with-background / focal).

The DETR recipe trains EVERY query: matched ones toward their class,
unmatched ones toward "no object" (arXiv:2005.12872 §3.1, eos_coef 0.1);
Deformable-DETR swaps CE for sigmoid focal loss with no background class
(arXiv:2010.04159 §4.1).  These tests pin both conventions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msda_tpu.parallel.train import detection_loss


def _setup(N=8, M=3, K=5, B=2, seed=0):
    rng = np.random.default_rng(seed)
    labels = jnp.asarray(rng.integers(0, K - 1, (B, M)), jnp.int32)
    tboxes = jnp.asarray(0.25 + 0.5 * rng.random((B, M, 4)), jnp.float32)
    mask = jnp.ones((B, M), jnp.float32)
    targets = {"labels": labels, "boxes": tboxes, "mask": mask}
    # matched (fixed) queries predict perfectly; unmatched rows left to
    # the caller
    logits = np.full((B, N, K), -10.0, np.float32)
    for b in range(B):
        for m in range(M):
            logits[b, m, int(labels[b, m])] = 10.0
    boxes = np.tile(
        np.asarray(tboxes).mean(1, keepdims=True), (1, N, 1)
    ).astype(np.float32)
    boxes[:, :M] = np.asarray(tboxes)
    return logits, boxes, targets, K


def test_unmatched_queries_pay_background_ce():
    """Unmatched queries confidently predicting a real class must cost more
    than ones predicting background — i.e. they DO receive supervision."""
    logits, boxes, targets, K = _setup()
    bg = logits.copy()
    bg[:, 3:, K - 1] = 10.0     # unmatched queries: confident background
    garbage = logits.copy()
    garbage[:, 3:, 0] = 10.0    # unmatched queries: confident real class

    l_bg = float(detection_loss(
        {"logits": jnp.asarray(bg), "boxes": jnp.asarray(boxes)}, targets))
    l_garbage = float(detection_loss(
        {"logits": jnp.asarray(garbage), "boxes": jnp.asarray(boxes)},
        targets))
    assert l_bg < l_garbage - 0.1, (l_bg, l_garbage)
    # and the gradient actually reaches an unmatched query's logits
    g = jax.grad(lambda lg: detection_loss(
        {"logits": lg, "boxes": jnp.asarray(boxes)}, targets))(
        jnp.asarray(garbage))
    assert float(jnp.abs(g[:, 3:]).max()) > 0.0


def test_eos_coef_downweights_background():
    logits, boxes, targets, K = _setup()
    garbage = logits.copy()
    garbage[:, 3:, 0] = 10.0
    out = {"logits": jnp.asarray(garbage), "boxes": jnp.asarray(boxes)}
    l_small = float(detection_loss(out, targets, eos_coef=0.01))
    l_large = float(detection_loss(out, targets, eos_coef=1.0))
    assert l_small < l_large


def test_focal_perfect_predictions_near_zero():
    logits, boxes, targets, K = _setup()
    # focal convention: no background class; unmatched stay all-negative
    out = {"logits": jnp.asarray(logits), "boxes": jnp.asarray(boxes)}
    l_perfect = float(detection_loss(
        out, targets, class_loss="focal", giou_weight=0.0))
    assert l_perfect < 1e-3, l_perfect

    garbage = logits.copy()
    garbage[:, 3:, 0] = 10.0  # unmatched queries fire confidently
    l_garbage = float(detection_loss(
        {"logits": jnp.asarray(garbage), "boxes": jnp.asarray(boxes)},
        targets, class_loss="focal", giou_weight=0.0))
    assert l_garbage > l_perfect + 0.1


def test_focal_matches_manual_formula():
    """Focal term equals the hand-computed alpha-balanced modulated BCE."""
    rng = np.random.default_rng(1)
    B, N, K, M = 1, 4, 3, 2
    logits = rng.standard_normal((B, N, K)).astype(np.float32)
    labels = jnp.asarray([[0, 2]], jnp.int32)
    tboxes = jnp.asarray(rng.random((B, M, 4)), jnp.float32)
    targets = {"labels": labels, "boxes": tboxes,
               "mask": jnp.ones((B, M), jnp.float32)}
    boxes = jnp.asarray(np.tile(np.asarray(tboxes), (1, 2, 1)))
    boxes = boxes[:, :N]

    got = float(detection_loss(
        {"logits": jnp.asarray(logits), "boxes": boxes}, targets,
        class_loss="focal", giou_weight=0.0))

    # manual: matched queries 0/1 (fixed matcher) get one-hot rows
    onehot = np.zeros((B, N, K), np.float32)
    onehot[0, 0, 0] = 1.0
    onehot[0, 1, 2] = 1.0
    p = 1.0 / (1.0 + np.exp(-logits))
    alpha, gamma = 0.25, 2.0
    pt = np.where(onehot > 0, p, 1.0 - p)
    a = np.where(onehot > 0, alpha, 1.0 - alpha)
    bce = -np.log(np.clip(pt, 1e-12, 1.0))
    focal = a * (1.0 - pt) ** gamma * bce
    # Deformable-DETR normalization: sum over (B, N, K) / num real boxes
    cls = focal.sum() / M
    l1 = np.abs(np.asarray(boxes)[:, :M] - np.asarray(tboxes)).sum(-1)
    want = cls + 5.0 * (l1.sum() / M)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_focal_with_auction_under_jit():
    logits, boxes, targets, K = _setup(seed=3)
    out = {"logits": jnp.asarray(logits), "boxes": jnp.asarray(boxes)}
    loss = float(jax.jit(
        lambda o, t: detection_loss(o, t, matcher="auction",
                                    class_loss="focal")
    )(out, targets))
    assert np.isfinite(loss)


def test_invalid_class_loss_raises():
    logits, boxes, targets, K = _setup()
    with pytest.raises(ValueError, match="class_loss"):
        detection_loss(
            {"logits": jnp.asarray(logits), "boxes": jnp.asarray(boxes)},
            targets, class_loss="hinge")
