"""Pure-jnp reference implementation of multiscale deformable attention.

This is the semantics specification for the whole framework: a gather-based,
fully differentiable (via JAX AD) implementation of the MSDA op from
Deformable DETR (arXiv:2010.04159) that runs on any JAX backend (CPU / TPU).

It plays the role the torch ``native_multiscale_deformable_attention``
fallback plays in the reference implementation
(/root/reference/src/msda_triton/frontend.py:15-68), but is designed
TPU-first: instead of per-level ``grid_sample`` calls over a Python loop of
strided tensor views, it computes flat pyramid indices for the four bilinear
corners and performs four batched gathers over the flattened pixel axis,
which XLA maps onto its native gather machinery and fuses with the
surrounding arithmetic.  ``sampling_points`` semantics (normalized [0, 1]
(x, y) coords), ``padding_mode`` in {"border", "zeros"} and
``align_corners`` in {True, False} match ``torch.nn.functional.grid_sample``
exactly (unnormalization formulas mirror
/root/reference/src/msda_triton/kernels.py:141-146, OOB masking
:156-162, clamping :166-169).

Notation (same as the reference, kernels.py:8-15):
    img:                [B, I, H, C]          flattened feature pyramid
    img_shapes:         [L, 2]                per-level (height, width)
    sampling_points:    [B, N, H, L, P, 2]    normalized (x, y) in [0, 1]
    attention_weights:  [B, N, H, L, P]
    output:             [B, N, H, C]
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "native_multiscale_deformable_attention",
    "compute_level_data",
]


def compute_level_data(img_shapes, dtype=jnp.float32):
    """Split ``img_shapes`` into per-level heights, widths and flat offsets.

    Accepts a [L, 2] integer array (traced or concrete), a numpy array, or a
    sequence of (h, w) pairs.  Returns float heights/widths of shape [L] and
    int32 flat start offsets of shape [L] into the flattened pixel axis
    (the cumsum construction mirrors
    /root/reference/src/msda_triton/kernels.py:58-62).
    """
    shapes = jnp.asarray(img_shapes)
    if shapes.ndim != 2 or shapes.shape[-1] != 2:
        raise ValueError(f"img_shapes must have shape [L, 2], got {shapes.shape}")
    h = shapes[:, 0]
    w = shapes[:, 1]
    sizes = (h * w).astype(jnp.int32)
    level_offsets = jnp.cumsum(sizes) - sizes
    return h.astype(dtype), w.astype(dtype), level_offsets


def _unnormalize(coord, extent, align_corners):
    """Map [0, 1]-normalized coords to pixel coords, grid_sample-style.

    align_corners=True:  x_pix = x * (W - 1)         (corner-aligned)
    align_corners=False: x_pix = x * W - 0.5          (pixel-center-aligned)
    (Reference: kernels.py:141-146.)
    """
    if align_corners:
        return coord * (extent - 1.0)
    return coord * extent - 0.5


def native_multiscale_deformable_attention(
    img,
    img_shapes,
    sampling_points,
    attention_weights,
    padding_mode: str = "border",
    align_corners: bool = False,
):
    """Gather-based multiscale deformable attention (any JAX backend).

    Args:
        img: ``[B, I, H, C]`` flattened feature pyramid where
            ``I = sum(h_l * w_l)``.
        img_shapes: ``[L, 2]`` integer (height, width) per pyramid level.
        sampling_points: ``[B, N, H, L, P, 2]`` normalized (x, y) in [0, 1];
            (0, 0) is the top-left corner, (1, 1) the bottom-right.
        attention_weights: ``[B, N, H, L, P]``.
        padding_mode: "border" clamps out-of-bounds samples to the nearest
            pixel, "zeros" zeroes them (grid_sample semantics).
        align_corners: grid alignment, see ``torch.nn.functional.grid_sample``.

    Returns:
        ``[B, N, H, C]`` attention-weighted bilinear samples.
    """
    if padding_mode not in ("border", "zeros"):
        raise ValueError(
            f"padding_mode must be 'border' or 'zeros', got {padding_mode!r}"
        )
    img = jnp.asarray(img)
    sampling_points = jnp.asarray(sampling_points)
    attention_weights = jnp.asarray(attention_weights)
    B, I, H, C = img.shape  # noqa: E741
    _, N, _, L, P, _ = sampling_points.shape

    # All interpolation arithmetic in f32 (or f64 off-TPU) regardless of the
    # storage dtype; mirrors the reference AMP policy of
    # frontend.py:111 (cast_inputs=torch.float32) and kernels.py:32-41.
    compute_dtype = jnp.promote_types(sampling_points.dtype, jnp.float32)
    pts = sampling_points.astype(compute_dtype)

    hf, wf, level_offsets = compute_level_data(img_shapes, compute_dtype)
    # Broadcast shapes to [1, 1, 1, L, 1] against [B, N, H, L, P].
    hf = hf[None, None, None, :, None]
    wf = wf[None, None, None, :, None]
    wi = wf.astype(jnp.int32)
    hi = hf.astype(jnp.int32)
    offs = level_offsets[None, None, None, :, None]

    x = _unnormalize(pts[..., 0], wf, align_corners)
    y = _unnormalize(pts[..., 1], hf, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[..., None]  # [B, N, H, L, P, 1]
    dy = (y - y0)[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    # Border semantics = index clamping (reference kernels.py:166-169).
    x0c = jnp.clip(x0i, 0, wi - 1)
    x1c = jnp.clip(x1i, 0, wi - 1)
    y0c = jnp.clip(y0i, 0, hi - 1)
    y1c = jnp.clip(y1i, 0, hi - 1)

    # img laid out [B, H, I, C] so the gather axis is contiguous per (b, h).
    imgT = img.transpose(0, 2, 1, 3)

    def gather(yc, xc):
        """Gather img rows at flat pyramid index per point: -> [B,N,H,L,P,C]."""
        idx = offs + yc * wi + xc  # [B, N, H, L, P]
        idxT = idx.transpose(0, 2, 1, 3, 4).reshape(B, H, N * L * P)
        g = jnp.take_along_axis(imgT, idxT[..., None], axis=2)
        return g.reshape(B, H, N, L, P, C).transpose(0, 2, 1, 3, 4, 5)

    v00 = gather(y0c, x0c)
    v01 = gather(y0c, x1c)
    v10 = gather(y1c, x0c)
    v11 = gather(y1c, x1c)

    if padding_mode == "zeros":
        # Zero out corners that fall outside the level (kernels.py:156-162,
        # 228-231): a corner is valid iff its *unclamped* index is in range.
        mx0 = ((x0i >= 0) & (x0i < wi)).astype(compute_dtype)[..., None]
        mx1 = ((x1i >= 0) & (x1i < wi)).astype(compute_dtype)[..., None]
        my0 = ((y0i >= 0) & (y0i < hi)).astype(compute_dtype)[..., None]
        my1 = ((y1i >= 0) & (y1i < hi)).astype(compute_dtype)[..., None]
        w00 = my0 * mx0
        w01 = my0 * mx1
        w10 = my1 * mx0
        w11 = my1 * mx1
    else:
        w00 = w01 = w10 = w11 = jnp.ones((), compute_dtype)

    c00 = w00 * (1.0 - dy) * (1.0 - dx)
    c01 = w01 * (1.0 - dy) * dx
    c10 = w10 * dy * (1.0 - dx)
    c11 = w11 * dy * dx

    samples = (
        v00.astype(compute_dtype) * c00
        + v01.astype(compute_dtype) * c01
        + v10.astype(compute_dtype) * c10
        + v11.astype(compute_dtype) * c11
    )  # [B, N, H, L, P, C]

    out = jnp.einsum(
        "bnhlpc,bnhlp->bnhc",
        samples,
        attention_weights.astype(compute_dtype),
    )
    return out.astype(img.dtype)
