"""MultiscaleDeformableAttention module (flax.linen).

TPU-native analogue of the reference nn.Module
(/root/reference/src/msda_triton/frontend.py:175-292): the same three
projections (img input, query input producing per-point offsets + weight
logits, query output), softmax over the flattened (levels x points) axis,
and the same 2-/4-coordinate reference-point handling.

Known reference quirk, replicated deliberately: for 2-coordinate reference
points the reference divides the (x, y) offsets by ``img_shapes`` which is
in **(height, width)** order (frontend.py:275 with the (h, w) docstring at
frontend.py:158) — i.e. x-offsets are normalized by height and y-offsets by
width, the transpose of the original Deformable DETR
``offset_normalizer = stack([w, h])``.  ``offset_normalizer="reference"``
(default) matches the reference bit-for-bit; ``offset_normalizer="detr"``
uses the original paper's (w, h) order.
"""

from __future__ import annotations

from typing import Literal

import flax.linen as nn
import jax.numpy as jnp

from ..ops import multiscale_deformable_attention

__all__ = ["MultiscaleDeformableAttention"]


class MultiscaleDeformableAttention(nn.Module):
    """Multiscale deformable attention with input/output projections.

    See Figure 2 of https://arxiv.org/pdf/2010.04159 for the op.

    Attributes:
        emb_dim: feature dimension of inputs/outputs.
        hidden_dim: projected feature dimension; must be divisible by
            ``num_heads``.
        num_levels: number of feature pyramid levels.
        num_heads: number of attention heads.
        num_points: sampling points per head per level.
        padding_mode: "border" or "zeros" out-of-bounds handling.
        align_corners: grid alignment (see grid_sample docs).
        offset_normalizer: "reference" (msda-triton-compatible (h, w)
            normalization, frontend.py:275) or "detr" (original paper (w, h)).
        impl: forwarded to :func:`multiscale_deformable_attention`.
    """

    emb_dim: int
    hidden_dim: int
    num_levels: int
    num_heads: int
    num_points: int
    padding_mode: Literal["border", "zeros"] = "border"
    align_corners: bool = False
    offset_normalizer: Literal["reference", "detr"] = "reference"
    impl: str = "auto"
    param_dtype: jnp.dtype = jnp.float32
    # activation/compute dtype: bf16 runs the projections on the MXU's
    # native half precision AND routes the op through its single-pass
    # bf16 kernel scheme (pallas_fwd.resolve_scheme); params stay
    # param_dtype (f32 master weights — the standard TPU mixed policy)
    compute_dtype: jnp.dtype | None = None
    # Optional jax.sharding.Mesh with ("dp", "sp", "tp") axes: when set, the
    # op operands/outputs carry the canonical MSDA shardings (batch=dp,
    # queries=sp, heads=tp) so GSPMD partitions multi-chip execution.
    mesh: object = None

    def setup(self):
        if self.hidden_dim % self.num_heads != 0:
            raise ValueError(
                f"Hidden dimension (hidden_dim={self.hidden_dim}) should be "
                f"divisible by number of heads (num_heads={self.num_heads})."
            )
        H, L, P = self.num_heads, self.num_levels, self.num_points
        self.img_input_proj = nn.Dense(
            self.hidden_dim, param_dtype=self.param_dtype,
            dtype=self.compute_dtype, name="img_input_proj"
        )
        self.query_input_proj = nn.Dense(
            H * L * P * 3, param_dtype=self.param_dtype,
            dtype=self.compute_dtype, name="query_input_proj"
        )
        self.query_output_proj = nn.Dense(
            self.emb_dim, param_dtype=self.param_dtype,
            dtype=self.compute_dtype, name="query_output_proj"
        )

    def __call__(self, img, img_shapes, queries, reference_points):
        """Args:
            img: ``[B, I, emb_dim]`` flattened feature pyramid.
            img_shapes: ``[L, 2]`` integer (height, width) per level.
            queries: ``[B, N, emb_dim]`` latent queries.
            reference_points: ``[B, N, 2]`` normalized (x, y) positions or
                ``[B, N, 4]`` normalized (cx, cy, w, h) boxes.

        Returns:
            ``[B, N, emb_dim]``.
        """
        B, I, _ = img.shape  # noqa: E741
        _, N, _ = queries.shape
        H, L, P = self.num_heads, self.num_levels, self.num_points
        C = self.hidden_dim

        # offsets + attention logits from queries (frontend.py:253-261).
        # The point/weight math runs in at least f32 even under a bf16
        # compute_dtype: bf16's 8 mantissa bits would quantize absolute
        # sampling positions to ~1/256 of a level — the same reason the
        # reference op casts its inputs up under AMP (frontend.py:111).
        # promote (not a hard f32 cast) so the f64 interpreter path keeps
        # full precision.  The pyramid stays compute_dtype: img dtype
        # alone selects the kernel's contraction scheme (bf16 = the fast
        # single-pass path).
        q = self.query_input_proj(queries)
        q = q.astype(jnp.promote_types(q.dtype, jnp.float32))
        q = q.reshape(B, N, H, L, P, 3)
        offsets, logits = q[..., :2], q[..., 2]
        attention_weights = nn.softmax(
            logits.reshape(B, N, H, L * P), axis=-1
        ).reshape(B, N, H, L, P)

        # project image to heads (frontend.py:264-267)
        img_p = self.img_input_proj(img).reshape(B, I, H, C // H)

        shapes = jnp.asarray(img_shapes)
        last = reference_points.shape[-1]
        if last == 2:
            if self.offset_normalizer == "reference":
                normalizer = shapes.astype(offsets.dtype)  # (h, w) order
            else:  # "detr": (w, h) order
                normalizer = shapes[:, ::-1].astype(offsets.dtype)
            # [B, N, 1, 1, 1, 2] + [B, N, H, L, P, 2] / [L, 1, 2]
            sampling_points = (
                reference_points[:, :, None, None, None, :]
                + offsets / normalizer[:, None, :]
            )
        elif last == 4:
            # box-scaled offsets (frontend.py:277-282)
            sampling_points = (
                reference_points[:, :, None, None, None, :2]
                + offsets
                * reference_points[:, :, None, None, None, 2:]
                / (2 * P)
            )
        else:
            raise ValueError(
                "`reference_points` should have last dim 2 or 4, "
                f"but got {last}."
            )

        if self.mesh is not None:
            from ..ops.msda import resolved_impl
            from ..parallel.sharding import (
                shard_map_multiscale_deformable_attention,
                sharded_multiscale_deformable_attention,
            )

            # GSPMD partitions every XLA impl through sharding
            # constraints, but cannot partition a pallas_call
            # (parallel/sharding.py docs); when the op resolves to the
            # Pallas kernels, go through shard_map so each device runs
            # the kernel on its local (dp, sp, tp) shard.
            if resolved_impl(self.impl, shapes, img_p.dtype) == "pallas":
                out = shard_map_multiscale_deformable_attention(
                    self.mesh,
                    img_p,
                    shapes,
                    sampling_points,
                    attention_weights,
                    self.padding_mode,
                    self.align_corners,
                    impl="pallas",
                )
            else:
                out = sharded_multiscale_deformable_attention(
                    self.mesh,
                    img_p,
                    shapes,
                    sampling_points,
                    attention_weights,
                    self.padding_mode,
                    self.align_corners,
                    impl=self.impl,
                )
        else:
            out = multiscale_deformable_attention(
                img_p,
                shapes,
                sampling_points,
                attention_weights,
                self.padding_mode,
                self.align_corners,
                impl=self.impl,
            )
        out = out.reshape(B, N, C)
        return self.query_output_proj(out)
