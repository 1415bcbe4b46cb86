"""Deformable-DETR-style detection model built on the MSDA op.

The reference repo ships only the attention module; its north-star use case
is Deformable DETR / Grounding DINO (README.md:25-34 detection-parity demo).
This module provides that surrounding model family, TPU-first: a deformable
encoder over the flattened feature pyramid, a decoder with learned queries,
and detection heads — the standard architecture of arXiv:2010.04159 §4.

Everything is jit-friendly (static shapes, no data-dependent control flow)
and shards over a (dp, sp, tp) mesh via the canonical MSDA shardings.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .attention import MultiscaleDeformableAttention

__all__ = [
    "make_encoder_reference_points",
    "make_proposal_anchors",
    "DeformableEncoderLayer",
    "DeformableDecoderLayer",
    "DeformableDetr",
    "postprocess",
]


def make_proposal_anchors(img_shapes, base_scale: float = 0.05):
    """Per-pixel anchor boxes for two-stage proposal generation: [I, 4].

    Each pyramid pixel anchors a box at its own center with a per-level
    size of ``base_scale * 2^level`` (Deformable DETR §A.4: proposals at
    coarser levels cover larger areas).  Returned in normalized cxcywh.
    """
    shapes = np.asarray(img_shapes)
    anchors = []
    for lvl, (h, w) in enumerate(shapes):
        ys, xs = np.meshgrid(
            (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
        )
        wh = np.full_like(xs, min(base_scale * (2 ** lvl), 0.9))
        anchors.append(
            np.stack([xs, ys, wh, wh], axis=-1).reshape(-1, 4)
        )
    return jnp.asarray(np.concatenate(anchors, axis=0), jnp.float32)


def make_encoder_reference_points(img_shapes) -> jnp.ndarray:
    """Normalized (x, y) centers of every pyramid pixel: [I, 2].

    Encoder self-attention uses each pixel as a query whose reference point
    is its own location (Deformable DETR §A.2).
    """
    shapes = np.asarray(img_shapes)
    refs = []
    for h, w in shapes:
        ys, xs = np.meshgrid(
            (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
        )
        refs.append(np.stack([xs, ys], axis=-1).reshape(-1, 2))
    return jnp.asarray(np.concatenate(refs, axis=0), jnp.float32)


class _FFN(nn.Module):
    dim: int
    hidden: int
    compute_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.hidden, dtype=self.compute_dtype)(x)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.compute_dtype)(y)
        return nn.LayerNorm(dtype=self.compute_dtype)(x + y)


class DeformableEncoderLayer(nn.Module):
    """Pyramid self-attention: every pixel attends deformably to the pyramid."""

    emb_dim: int
    num_levels: int
    num_heads: int
    num_points: int
    ffn_dim: int = 1024
    compute_dtype: jnp.dtype | None = None
    impl: str = "auto"
    mesh: object = None

    @nn.compact
    def __call__(self, feats, img_shapes, reference_points):
        """feats [B, I, D]; reference_points [I, 2] -> [B, I, D]."""
        B, I, D = feats.shape  # noqa: E741
        attn = MultiscaleDeformableAttention(
            emb_dim=self.emb_dim,
            hidden_dim=self.emb_dim,
            num_levels=self.num_levels,
            num_heads=self.num_heads,
            num_points=self.num_points,
            padding_mode="border",
            align_corners=False,
            compute_dtype=self.compute_dtype,
            impl=self.impl,
            mesh=self.mesh,
        )
        refs = jnp.broadcast_to(reference_points[None], (B, I, 2))
        y = attn(feats, img_shapes, feats, refs)
        x = nn.LayerNorm(dtype=self.compute_dtype)(feats + y)
        return _FFN(self.emb_dim, self.ffn_dim, self.compute_dtype)(x)


class DeformableDecoderLayer(nn.Module):
    """Query self-attention + deformable cross-attention into the pyramid."""

    emb_dim: int
    num_levels: int
    num_heads: int
    num_points: int
    ffn_dim: int = 1024
    compute_dtype: jnp.dtype | None = None
    impl: str = "auto"
    mesh: object = None

    @nn.compact
    def __call__(self, queries, feats, img_shapes, reference_points):
        """queries [B, N, D]; feats [B, I, D]; reference_points [B, N, 2|4]."""
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.emb_dim,
            dtype=self.compute_dtype,
        )
        x = nn.LayerNorm(dtype=self.compute_dtype)(queries + sa(queries))
        ca = MultiscaleDeformableAttention(
            emb_dim=self.emb_dim,
            hidden_dim=self.emb_dim,
            num_levels=self.num_levels,
            num_heads=self.num_heads,
            num_points=self.num_points,
            padding_mode="border",
            align_corners=False,
            compute_dtype=self.compute_dtype,
            impl=self.impl,
            mesh=self.mesh,
        )
        y = ca(feats, img_shapes, x, reference_points)
        x = nn.LayerNorm(dtype=self.compute_dtype)(x + y)
        return _FFN(self.emb_dim, self.ffn_dim, self.compute_dtype)(x)


class DeformableDetr(nn.Module):
    """Minimal Deformable-DETR detector over a multi-scale feature pyramid.

    Consumes per-level backbone features (already extracted; any backbone
    can feed this), runs the deformable encoder/decoder, and emits class
    logits and normalized (cx, cy, w, h) boxes per query — the structure of
    arXiv:2010.04159 §4 including both paper variants:

    * *iterative bounding-box refinement* (``with_box_refinement=True``):
      per-layer box heads refine the references the next decoder layer
      samples around, with per-layer aux predictions for deep supervision;
    * *two-stage* (``two_stage=True``): every encoder pixel emits a
      proposal (objectness + box on a per-level anchor) and the top
      ``num_queries`` proposals seed the decoder's reference boxes and
      positional content, with ``enc`` outputs for proposal supervision.
    """

    num_classes: int
    emb_dim: int = 256
    num_heads: int = 8
    num_points: int = 4
    num_queries: int = 100
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    ffn_dim: int = 1024
    with_box_refinement: bool = False
    two_stage: bool = False
    # rematerialize encoder/decoder layers in the backward pass
    # (jax.checkpoint via nn.remat): activations of each layer are
    # recomputed instead of saved — the standard TPU HBM-for-FLOPs trade
    # for deep stacks.  The MSDA op's backward already rematerializes its
    # interpolation internally either way (ops/msda.py).
    remat: bool = False
    # activation/compute dtype for the transformer stack (bf16 = the TPU
    # mixed-precision policy: f32 master params, bf16 matmuls, and the
    # MSDA op's fast single-pass bf16 kernel scheme).  Sampling-point
    # geometry, reference-box math and the prediction heads stay f32
    # (see models/attention.py and the head comments below).
    compute_dtype: jnp.dtype | None = None
    impl: str = "auto"
    mesh: object = None

    @nn.compact
    def __call__(self, pyramid: Sequence[jax.Array], img_shapes):
        """pyramid: per-level features [B, h_l, w_l, C_l]; img_shapes [L, 2].

        Returns dict(logits=[B, N, num_classes], boxes=[B, N, 4] in
        normalized cxcywh).
        """
        L = len(pyramid)
        B = pyramid[0].shape[0]

        # per-level input projection to emb_dim + level embedding, flatten
        # explicit f32 param dtype: initializer defaults follow the global
        # x64 flag, which would silently make these three raw params f64
        # while every Dense stays f32
        level_emb = self.param(
            "level_embedding",
            nn.initializers.normal(0.02),
            (L, self.emb_dim),
            jnp.float32,
        )
        feats = []
        for lvl, f in enumerate(pyramid):
            x = nn.Dense(self.emb_dim, dtype=self.compute_dtype,
                         name=f"input_proj_{lvl}")(f)
            x = x.reshape(B, -1, self.emb_dim) + level_emb[lvl].astype(x.dtype)
            feats.append(x)
        feats = jnp.concatenate(feats, axis=1)  # [B, I, D]

        # img_shapes is closed over by the remat bodies (not passed through
        # them): jax.checkpoint treats remat-function arguments as
        # differentiable inputs, and the Pallas path additionally requires
        # the pyramid geometry to stay concrete.
        def enc_body(mdl, f, r):
            return mdl(f, img_shapes, r)

        def dec_body(mdl, q, f, r):
            return mdl(q, f, img_shapes, r)

        if self.remat:
            enc_body = nn.remat(enc_body)
            dec_body = nn.remat(dec_body)

        enc_refs = make_encoder_reference_points(img_shapes)
        for i in range(self.num_encoder_layers):
            feats = enc_body(DeformableEncoderLayer(
                emb_dim=self.emb_dim,
                num_levels=L,
                num_heads=self.num_heads,
                num_points=self.num_points,
                ffn_dim=self.ffn_dim,
                compute_dtype=self.compute_dtype,
                impl=self.impl,
                mesh=self.mesh,
                name=f"encoder_layer_{i}",
            ), feats, enc_refs)

        query_emb = self.param(
            "query_embedding",
            nn.initializers.normal(0.02),
            (self.num_queries, self.emb_dim),
            jnp.float32,
        )
        queries = jnp.broadcast_to(
            query_emb[None], (B, self.num_queries, self.emb_dim)
        )
        if self.compute_dtype is not None:
            queries = queries.astype(self.compute_dtype)
        eps = 1e-5

        def inv_sigmoid(p):
            return jnp.log(p / (1.0 - p + eps) + eps)

        enc_out = None
        if self.two_stage:
            # Two-stage (arXiv:2010.04159 sA.4): every encoder pixel emits
            # a proposal (objectness + box delta on its anchor); the top
            # num_queries proposals seed the decoder's reference boxes and
            # positional content.  The decoder consumes detached boxes, so
            # the proposal heads train *only* through the ``enc`` outputs —
            # ``parallel.detection_loss`` consumes them (objectness + box
            # loss on anchor-assigned proposals; the anchors ride along in
            # the output dict so the loss can do the assignment).
            anchors = make_proposal_anchors(img_shapes)[None]  # [1, I, 4]
            enc_obj = nn.Dense(1, name="enc_objectness")(feats)[..., 0]
            enc_delta = nn.Dense(4, name="enc_box_head")(feats)
            enc_boxes = jax.nn.sigmoid(inv_sigmoid(anchors) + enc_delta)
            _, top_idx = jax.lax.top_k(enc_obj, self.num_queries)  # [B, Nq]
            refs = jnp.take_along_axis(
                enc_boxes, top_idx[..., None], axis=1
            )  # [B, Nq, 4]
            enc_out = {
                "logits": enc_obj[..., None],
                "boxes": enc_boxes,
                "anchors": anchors[0],  # [I, 4], constant (no grad)
            }
            # positional content from the selected proposals
            pos = nn.Dense(self.emb_dim, dtype=self.compute_dtype,
                           name="proposal_pos_proj")(
                jax.lax.stop_gradient(refs)
            )
            queries = queries + pos
            refs = jax.lax.stop_gradient(refs)
        else:
            # learned reference boxes per query (sigmoid-normalized cxcywh)
            ref_logit = self.param(
                "reference_box_logits",
                nn.initializers.normal(0.5),
                (self.num_queries, 4),
                jnp.float32,
            )
            refs = jax.nn.sigmoid(ref_logit)[None]
            refs = jnp.broadcast_to(refs, (B, self.num_queries, 4))

        aux = []
        for i in range(self.num_decoder_layers):
            queries = dec_body(DeformableDecoderLayer(
                emb_dim=self.emb_dim,
                num_levels=L,
                num_heads=self.num_heads,
                num_points=self.num_points,
                ffn_dim=self.ffn_dim,
                compute_dtype=self.compute_dtype,
                impl=self.impl,
                mesh=self.mesh,
                name=f"decoder_layer_{i}",
            ), queries, feats, refs)
            if self.with_box_refinement and i < self.num_decoder_layers - 1:
                # per-layer head refines the boxes the next layer samples
                # around; refs are detached between layers as in the paper
                # (gradient flows through the per-layer delta only)
                delta = nn.Dense(4, name=f"box_refine_{i}")(queries)
                refined = jax.nn.sigmoid(inv_sigmoid(refs) + delta)
                aux.append({
                    "logits": nn.Dense(
                        self.num_classes, name=f"aux_class_{i}"
                    )(queries),
                    "boxes": refined,
                })
                refs = jax.lax.stop_gradient(refined)

        logits = nn.Dense(self.num_classes, name="class_head")(queries)
        box_delta = nn.Dense(4, name="box_head")(queries)
        # box = reference box refined by the head (inverse-sigmoid space)
        boxes = jax.nn.sigmoid(inv_sigmoid(refs) + box_delta)
        out = {"logits": logits, "boxes": boxes}
        if self.with_box_refinement:
            out["aux"] = aux
        if enc_out is not None:
            out["enc"] = enc_out
        return out


def postprocess(outputs, top_k: int = 100,
                scoring: str = "softmax", image_sizes=None):
    """Decode detector outputs into ranked detections (jit-friendly).

    DETR-style one-to-one decoding (no NMS needed): scores over all
    (query, class) pairs, global top-k, boxes gathered per selected query.
    With ``image_sizes`` (``[B, 2]`` (height, width) per image), boxes are
    returned as absolute ``(x0, y0, x1, y1)`` pixel coordinates (the HF
    post-processor convention); otherwise normalized ``(cx, cy, w, h)``.

    ``scoring`` must match the training objective:

    * ``"softmax"`` (default) — softmax over classes with the **last class
      treated as background and dropped** before top-k.  This pairs with
      :func:`msda_tpu.parallel.detection_loss`'s softmax-CE convention
      (num_classes = background last), the original DETR recipe: emitted
      labels are always real classes and scores are true class posteriors.
    * ``"sigmoid"`` — per-class sigmoid over *all* classes (no background
      class), the Deformable-DETR focal-loss decode — pairs with
      ``detection_loss(class_loss="focal")``.

    Returns dict(scores=[B, K], labels=[B, K], boxes=[B, K, 4]) where
    boxes are normalized ``(cx, cy, w, h)`` — or absolute ``(x0, y0,
    x1, y1)`` pixel coordinates when ``image_sizes`` is given (above).
    """
    logits = outputs["logits"]
    boxes = outputs["boxes"]
    B, N, K = logits.shape
    if scoring == "softmax":
        probs = jax.nn.softmax(logits, axis=-1)[..., :-1]  # drop background
        K = K - 1
        scores = probs.reshape(B, N * K)
    elif scoring == "sigmoid":
        scores = jax.nn.sigmoid(logits).reshape(B, N * K)
    else:
        raise ValueError(
            f"scoring must be 'softmax' or 'sigmoid', got {scoring!r}"
        )
    top = min(int(top_k), N * K)  # static: top_k shapes the output
    sel_scores, flat_idx = jax.lax.top_k(scores, top)
    q_idx = flat_idx // K
    labels = flat_idx % K
    sel_boxes = jnp.take_along_axis(boxes, q_idx[..., None], axis=1)
    if image_sizes is not None:
        from ..parallel.boxes import box_cxcywh_to_xyxy

        sizes = jnp.asarray(image_sizes).astype(sel_boxes.dtype)  # [B, 2] (h, w)
        scale = jnp.stack(
            [sizes[:, 1], sizes[:, 0], sizes[:, 1], sizes[:, 0]], axis=-1
        )  # (w, h, w, h)
        sel_boxes = box_cxcywh_to_xyxy(sel_boxes) * scale[:, None, :]
    return {"scores": sel_scores, "labels": labels, "boxes": sel_boxes}
