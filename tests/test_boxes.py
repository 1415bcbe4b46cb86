"""Box geometry (IoU / GIoU) used by the matching cost and detection loss.

Oracle strategy: hand-computed closed-form cases plus the GIoU paper's
invariants (arXiv:1902.09630 §3): GIoU in [-1, 1], GIoU <= IoU with
equality iff the enclosing box is the union, GIoU -> -1 as boxes separate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from msda_tpu.parallel.boxes import (
    box_cxcywh_to_xyxy,
    box_iou_pairwise,
    generalized_box_iou,
    generalized_box_iou_pairwise,
)


def test_cxcywh_to_xyxy():
    got = np.asarray(box_cxcywh_to_xyxy(jnp.asarray([0.5, 0.5, 1.0, 0.5])))
    np.testing.assert_allclose(got, [0.0, 0.25, 1.0, 0.75], atol=1e-7)


def test_identical_boxes():
    b = jnp.asarray([[0.3, 0.4, 0.2, 0.1]])
    np.testing.assert_allclose(
        np.asarray(box_iou_pairwise(b, b)), [[1.0]], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(generalized_box_iou_pairwise(b, b)), [[1.0]], atol=1e-5)


def test_half_overlap_hand_case():
    # unit squares, shifted by half a width: inter 0.5, union 1.5,
    # enclosing 1.5 -> IoU = GIoU = 1/3
    a = jnp.asarray([[0.5, 0.5, 1.0, 1.0]])
    b = jnp.asarray([[1.0, 0.5, 1.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(box_iou_pairwise(a, b)), [[1 / 3]], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(generalized_box_iou_pairwise(a, b)), [[1 / 3]], atol=1e-5)


def test_disjoint_boxes_negative_giou():
    # unit squares two widths apart: IoU 0; enclosing 3x1, union 2
    # -> GIoU = 0 - (3 - 2)/3 = -1/3
    a = jnp.asarray([[0.5, 0.5, 1.0, 1.0]])
    b = jnp.asarray([[2.5, 0.5, 1.0, 1.0]])
    np.testing.assert_allclose(
        np.asarray(box_iou_pairwise(a, b)), [[0.0]], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(generalized_box_iou_pairwise(a, b)), [[-1 / 3]], atol=1e-5)


def test_giou_invariants_random():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((32, 4)), jnp.float32)
    b = jnp.asarray(rng.random((17, 4)), jnp.float32)
    iou = np.asarray(box_iou_pairwise(a, b))
    giou = np.asarray(generalized_box_iou_pairwise(a, b))
    assert np.all(giou >= -1.0 - 1e-5) and np.all(giou <= 1.0 + 1e-5)
    assert np.all(giou <= iou + 1e-5)
    assert np.all((iou >= 0.0) & (iou <= 1.0 + 1e-5))


def test_elementwise_matches_pairwise_diagonal():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.random((8, 4)), jnp.float32)
    b = jnp.asarray(rng.random((8, 4)), jnp.float32)
    elem = np.asarray(generalized_box_iou(a, b))
    pair = np.asarray(generalized_box_iou_pairwise(a, b))
    np.testing.assert_allclose(elem, np.diagonal(pair), atol=1e-6)


def test_degenerate_boxes_finite_and_grad_safe():
    """Zero-area boxes (masked-out targets) must yield finite values and
    finite gradients — NaN would survive the loss's ``* mask``."""
    a = jnp.asarray([[0.5, 0.5, 0.0, 0.0]])
    b = jnp.asarray([[0.5, 0.5, 0.0, 0.0]])
    assert np.isfinite(np.asarray(generalized_box_iou_pairwise(a, b))).all()

    g = jax.grad(lambda x: generalized_box_iou(x, b).sum())(a)
    assert np.isfinite(np.asarray(g)).all()


def test_matching_cost_giou_breaks_l1_ties():
    """Two candidate boxes with identical L1 distance to the target but
    different overlap: the GIoU term must prefer the overlapping one."""
    from msda_tpu.parallel.matcher import matching_cost

    target = jnp.asarray([[0.5, 0.5, 0.4, 0.4]])
    # same total L1 (0.2), different overlap quality:
    #   shifted box: IoU 1/3, enclosing = union      -> GIoU = 1/3
    #   contained sliver: IoU 1/2, enclosing = union -> GIoU = 1/2
    boxes = jnp.asarray([
        [0.7, 0.5, 0.4, 0.4],   # shifted by half a width
        [0.5, 0.5, 0.2, 0.4],   # centered, half the width
    ])
    logits = jnp.zeros((2, 3))
    labels = jnp.asarray([0])
    cost = np.asarray(matching_cost(logits, boxes, labels, target))
    cost_nog = np.asarray(matching_cost(
        logits, boxes, labels, target, giou_weight=0.0))
    # without GIoU the two rows tie; with it the better-overlap box wins
    np.testing.assert_allclose(cost_nog[0], cost_nog[1], atol=1e-6)
    assert cost[1, 0] < cost[0, 0] - 0.1


def test_detection_loss_giou_term():
    """giou_weight=0 reproduces the CE+L1 loss; perfect boxes pay zero
    GIoU loss; worse-overlap boxes pay more."""
    from msda_tpu.parallel.train import detection_loss

    rng = np.random.default_rng(2)
    B, M, K = 2, 4, 5
    labels = jnp.asarray(rng.integers(0, K - 1, (B, M)), jnp.int32)
    tboxes = jnp.asarray(
        0.25 + 0.5 * rng.random((B, M, 4)), jnp.float32)
    mask = jnp.ones((B, M), jnp.float32)
    logits = 10.0 * jax.nn.one_hot(labels, K)
    targets = {"labels": labels, "boxes": tboxes, "mask": mask}

    perfect = {"logits": logits, "boxes": tboxes}
    l_perfect = float(detection_loss(perfect, targets))
    l_perfect_nog = float(detection_loss(perfect, targets, giou_weight=0.0))
    np.testing.assert_allclose(l_perfect, l_perfect_nog, atol=1e-5)

    shifted = {"logits": logits, "boxes": tboxes.at[..., 0].add(0.2)}
    assert float(detection_loss(shifted, targets)) > float(
        detection_loss(shifted, targets, giou_weight=0.0))
