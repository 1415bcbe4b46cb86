"""Sharded training step for MSDA-based detectors.

TPU-native training loop pieces: optax optimizer, a detection loss, and a
``jit``-compiled train step whose inputs/parameters carry
``NamedSharding``s over a (dp, sp, tp) mesh — XLA/GSPMD inserts the
gradient all-reduces (dp) and activation collectives (tp) on ICI.

The reference library has no training infrastructure (SURVEY §2 / §5); this
is part of the framework extension that makes the op production-usable.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["detection_loss", "make_train_step", "replicate_params", "shard_params"]


def detection_loss(outputs, targets, matcher: str = "fixed",
                   aux_weight: float = 1.0, enc_weight: float = 1.0,
                   giou_weight: float = 2.0, class_loss: str = "ce",
                   eos_coef: float = 0.1, l1_weight: float = 5.0,
                   matcher_rounds: int = 2000,
                   return_metrics: bool = False):
    """Detection loss (classification + 5 * L1 box + 2 * GIoU — the
    published Deformable-DETR weights, identical to the matching cost's,
    arXiv:2010.04159 §4.1; GIoU per arXiv:1902.09630.  ``giou_weight=0``
    disables the GIoU term everywhere, including the encoder proposal
    loss).

    targets: dict(labels=[B, M] int, boxes=[B, M, 4] cxcywh in [0, 1],
    mask=[B, M] 1.0 for real objects).

    Every query receives classification supervision: matched queries pay
    for their target class, all others for "no object" (the original DETR
    recipe — without it unmatched queries are untrained at inference).

    class_loss:
        "ce":    softmax cross-entropy with the LAST class as no-object
                 background, down-weighted by ``eos_coef`` (DETR's
                 convention; pair with ``postprocess(scoring="softmax")``).
        "focal": sigmoid focal loss (alpha=0.25, gamma=2) with NO
                 background class — unmatched queries get all-zero targets
                 (Deformable-DETR's convention; pair with
                 ``postprocess(scoring="sigmoid")``).

    matcher:
        "fixed":   queries matched to targets by index (teacher-forced).
        "auction": Hungarian-style minimum-cost bipartite matching via the
                   jittable auction solver (parallel.matcher), as in the
                   original DETR/Deformable-DETR training recipe.

    When ``outputs`` carries ``"aux"`` (per-decoder-layer predictions from
    ``DeformableDetr(with_box_refinement=True)``), each aux head pays the
    same loss scaled by ``aux_weight`` — the paper's deep supervision
    (arXiv:2010.04159 §A.1, "auxiliary losses at each decoder layer").

    When ``outputs`` carries ``"enc"`` (two-stage encoder proposals from
    ``DeformableDetr(two_stage=True)``), the proposal heads pay an
    objectness + box loss scaled by ``enc_weight`` (see
    :func:`_enc_proposal_loss`) — without it the proposal heads receive no
    gradient at all, because the decoder consumes detached references.

    With ``return_metrics=True`` the call returns ``(loss, metrics)``
    where ``metrics["matcher_converged"]`` is a bool scalar — False means
    at least one auction matching (main or aux head, any batch element)
    hit its ``matcher_rounds`` budget and fell back to per-target argmin
    (possibly duplicate assignments).  Training loops using
    ``matcher="auction"`` should surface this instead of silently
    accepting a degenerate matching (see parallel.matcher's design note).
    With the fixed matcher the flag is trivially True.
    """
    loss, converged = _single_detection_loss(
        outputs, targets, matcher, giou_weight, class_loss, eos_coef,
        l1_weight=l1_weight, matcher_rounds=matcher_rounds)
    for aux_out in outputs.get("aux", ()):
        aux_loss, aux_conv = _single_detection_loss(
            aux_out, targets, matcher, giou_weight, class_loss, eos_coef,
            l1_weight=l1_weight, matcher_rounds=matcher_rounds
        )
        loss = loss + aux_weight * aux_loss
        converged = converged & aux_conv
    if "enc" in outputs:
        loss = loss + enc_weight * _enc_proposal_loss(
            outputs["enc"], targets, giou_weight=giou_weight,
            l1_weight=l1_weight
        )
    if return_metrics:
        return loss, {"matcher_converged": converged}
    return loss


def _enc_proposal_loss(enc, targets, giou_weight=2.0, l1_weight=5.0):
    """Two-stage encoder proposal loss (arXiv:2010.04159 §A.4 recipe,
    jit-friendly variant).

    Each real target is assigned the proposal whose *anchor* center is
    nearest its box center (static-shape center assignment instead of the
    paper's Hungarian pass over all ~I proposals — the anchors ride along
    in ``enc["anchors"]``).  Assigned proposals pay binary objectness +
    L1 + GIoU box losses; every other pixel pays background objectness, with the
    positive/negative halves normalized separately so ~I background pixels
    cannot drown out the handful of positives.
    """
    obj = enc["logits"][..., 0]  # [B, I]
    pboxes = enc["boxes"]        # [B, I, 4]
    anchors = enc["anchors"]     # [I, 4] normalized cxcywh
    tboxes = targets["boxes"]    # [B, M, 4]
    mask = targets["mask"]       # [B, M]

    # nearest-anchor-center assignment per target: [B, M]
    d = jnp.abs(
        anchors[None, :, None, :2] - tboxes[:, None, :, :2]
    ).sum(-1)  # [B, I, M]
    idx = jnp.argmin(d, axis=1)

    num_pixels = obj.shape[1]
    onehot = jax.nn.one_hot(idx, num_pixels) * mask[..., None]  # [B, M, I]
    pos = jnp.clip(onehot.sum(axis=1), 0.0, 1.0)  # [B, I]
    bce = optax.sigmoid_binary_cross_entropy(obj, pos)
    n_pos = jnp.maximum(pos.sum(), 1.0)
    n_neg = jnp.maximum((1.0 - pos).sum(), 1.0)
    obj_loss = (bce * pos).sum() / n_pos + (bce * (1.0 - pos)).sum() / n_neg

    sel = jnp.take_along_axis(pboxes, idx[..., None], axis=1)  # [B, M, 4]
    l1 = jnp.abs(sel - tboxes).sum(-1)
    n_real = jnp.maximum(mask.sum(), 1.0)
    loss = obj_loss + l1_weight * (l1 * mask).sum() / n_real
    if giou_weight:
        from .boxes import generalized_box_iou

        giou = generalized_box_iou(sel, tboxes)
        loss = loss + giou_weight * ((1.0 - giou) * mask).sum() / n_real
    return loss


def _single_detection_loss(outputs, targets, matcher, giou_weight=2.0,
                           class_loss="ce", eos_coef=0.1,
                           focal_alpha=0.25, focal_gamma=2.0,
                           l1_weight=5.0, matcher_rounds=2000):
    """Loss for one prediction head.  Returns ``(loss, converged)`` where
    ``converged`` is a bool scalar: True unless the auction matcher failed
    to assign every active target within ``matcher_rounds`` for some batch
    element (fixed matching is always True)."""
    logits = outputs["logits"]  # [B, N, K]
    boxes = outputs["boxes"]    # [B, N, 4]
    labels = targets["labels"]  # [B, M]
    tboxes = targets["boxes"]   # [B, M, 4]
    mask = targets["mask"]      # [B, M]
    B, N, K = logits.shape
    M = labels.shape[1]
    if M > N:
        raise ValueError(
            f"more targets ({M}) than queries ({N}): every real target "
            "needs a distinct query"
        )
    b_idx = jnp.arange(B)[:, None]

    if matcher == "auction":
        from .matcher import auction_assignment, matching_cost

        # the matcher's class cost follows the training objective
        cost_kind = "focal" if class_loss == "focal" else "softmax"

        def match_one(lg, bx, lb, tb, mk):
            cost = matching_cost(lg, bx, lb, tb, class_cost=cost_kind)
            # masked-out targets must not steal queries: make them cheap
            # everywhere equally (constant column -> arbitrary but harmless)
            cost = jnp.where(mk[None, :] > 0, cost, 0.0)
            return auction_assignment(
                cost, mk, max_rounds=matcher_rounds, return_state=True)

        q_idx, conv = jax.vmap(match_one)(logits, boxes, labels, tboxes, mask)
        converged = jnp.all(conv)
    elif matcher == "fixed":
        q_idx = jnp.broadcast_to(jnp.arange(M)[None], (B, M))
        converged = jnp.bool_(True)
    else:
        raise ValueError(f"matcher must be 'fixed' or 'auction', got {matcher!r}")

    sel_boxes = boxes[b_idx, q_idx]  # [B, M, 4]

    # Per-query class assignment covering EVERY query: matched queries get
    # their target class, all others the no-object value — DETR's recipe
    # trains unmatched queries toward "no object" (eos_coef-weighted),
    # without which they emit untrained garbage at inference.  no_object is
    # the last class for "ce" (background-last convention) and the
    # out-of-range index K for "focal" (one_hot -> all-zero row, the
    # sigmoid/no-background convention).  Masked-out targets scatter into a
    # dummy column N so they can never overwrite a real match.
    no_object = K - 1 if class_loss == "ce" else K
    safe_q = jnp.where(mask > 0, q_idx, N).astype(jnp.int32)
    full_labels = (
        jnp.full((B, N + 1), no_object, jnp.int32)
        .at[b_idx, safe_q].set(labels)[:, :N]
    )

    n_real = jnp.maximum(mask.sum(), 1.0)
    if class_loss == "ce":
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, full_labels)  # [B, N]
        w = jnp.where(full_labels == no_object, eos_coef, 1.0)
        cls = (ce * w).sum() / w.sum()
    elif class_loss == "focal":
        onehot = jax.nn.one_hot(full_labels, K)  # no-object -> zero row
        focal = optax.sigmoid_focal_loss(
            logits, onehot, alpha=focal_alpha, gamma=focal_gamma)
        # Deformable-DETR normalization: SUM over classes (not mean),
        # / num real boxes — a mean over K would weaken classification
        # gradients K-fold vs the published recipe
        cls = focal.sum() / n_real
    else:
        raise ValueError(
            f"class_loss must be 'ce' or 'focal', got {class_loss!r}")

    # box-term weights match the matching cost (the paper uses the SAME
    # 5*L1 + 2*GIoU weights in cost and loss — a mismatch makes matching
    # and optimization pull in different directions)
    l1 = jnp.abs(sel_boxes - tboxes).sum(-1)
    loss = cls + l1_weight * (l1 * mask).sum() / n_real
    if giou_weight:
        from .boxes import generalized_box_iou

        giou = generalized_box_iou(sel_boxes, tboxes)  # [B, M]
        loss = loss + giou_weight * ((1.0 - giou) * mask).sum() / n_real
    return loss, converged


def replicate_params(params, mesh: Mesh):
    """Replicate parameters across the mesh (dp+sp+tp all replicated)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), params)


def _tp_spec_for(path, leaf) -> P:
    """Megatron-style tensor-parallel PartitionSpec for one parameter.

    The attention projections have head-major output/input layouts
    (models/attention.py:99,106), so the tp axis splits them by head:

      img_input_proj / query_input_proj   kernel [in, out]: split *out*
          (column-parallel — each tp shard computes its heads' features)
      query_output_proj                   kernel [in(head-major), out]:
          split *in* (row-parallel — GSPMD inserts the closing all-reduce)

    Everything else (FFNs, heads, embeddings, norms) stays replicated.
    """
    names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    joined = "/".join(str(n) for n in names)
    is_kernel = names and str(names[-1]) == "kernel"
    is_bias = names and str(names[-1]) == "bias"
    if "img_input_proj" in joined or "query_input_proj" in joined:
        if is_kernel and leaf.ndim == 2:
            return P(None, "tp")
        if is_bias and leaf.ndim == 1:
            return P("tp")
    if "query_output_proj" in joined:
        if is_kernel and leaf.ndim == 2:
            return P("tp", None)
        # row-parallel bias stays replicated (added once after the
        # all-reduce, not per shard)
    return P()


def shard_params(params, mesh: Mesh):
    """Place parameters on the mesh with the attention projections split
    over the ``tp`` axis (see ``_tp_spec_for``); all other parameters are
    replicated.  Gradients/optimizer state inherit these shardings through
    the train step."""
    if "tp" not in mesh.axis_names:
        return replicate_params(params, mesh)

    def put(path, x):
        spec = _tp_spec_for(path, x)
        # only shard if the tp axis divides the dimension
        for axis, name in enumerate(spec):
            if name == "tp" and x.shape[axis] % mesh.shape["tp"] != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def make_train_step(model, optimizer, mesh: Mesh | None, img_shapes,
                    matcher: str = "fixed", aux_weight: float = 1.0,
                    enc_weight: float = 1.0, giou_weight: float = 2.0,
                    class_loss: str = "ce", eos_coef: float = 0.1,
                    l1_weight: float = 5.0, matcher_rounds: int = 2000,
                    return_metrics: bool = False):
    """Build a jitted train step:
    (params, opt_state, pyramid, targets) -> (params, opt_state, loss).

    With a ``mesh``, inputs carry the (dp, sp, tp) shardings (``pyramid``
    over dp; sp over pixels is implicit via the op constraints, targets
    over dp) and GSPMD inserts the collectives; ``mesh=None`` builds the
    same step single-device.  Every :func:`detection_loss` knob
    (``matcher``/``aux_weight``/``enc_weight``/``giou_weight``/
    ``class_loss``/``eos_coef``/``l1_weight``/``matcher_rounds``) is
    threaded through, so e.g. ``matcher="auction"`` trains with the DETR
    bipartite-matching recipe.

    ``return_metrics=True`` makes the step return
    ``(params, opt_state, loss, metrics)`` with
    ``metrics["matcher_converged"]`` from :func:`detection_loss` — the
    recommended mode for auction-matched training, so a non-converged
    (argmin-fallback) matching shows up in the training log instead of
    silently producing duplicate assignments.
    """

    def loss_fn(params, pyramid, targets):
        if mesh is not None:
            pyramid = [
                jax.lax.with_sharding_constraint(
                    f, NamedSharding(mesh, P("dp", None, None, None))
                )
                for f in pyramid
            ]
        outputs = model.apply(params, pyramid, img_shapes)
        return detection_loss(outputs, targets, matcher=matcher,
                              aux_weight=aux_weight, enc_weight=enc_weight,
                              giou_weight=giou_weight, class_loss=class_loss,
                              eos_coef=eos_coef, l1_weight=l1_weight,
                              matcher_rounds=matcher_rounds,
                              return_metrics=return_metrics)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, pyramid, targets):
        if return_metrics:
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, pyramid, targets)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                params, pyramid, targets)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if return_metrics:
            return params, opt_state, loss, metrics
        return params, opt_state, loss

    return train_step
