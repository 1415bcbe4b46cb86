"""TPU-optimized XLA formulation of multiscale deformable attention.

Forward: per-level batched 2x2-patch gathers.  Instead of the reference
Triton kernel's four independent per-corner loads
(/root/reference/src/msda_triton/kernels.py:207-210), each sampling point
issues ONE ``lax.gather`` fetching the full 2x2xC bilinear footprint
(slice_sizes=(1, 1, 2, 2, C) on the [B, H, h, w, C] level image).  The four
corners of a bilinear sample are contiguous 2x2 patches, so this cuts the
number of gathered slices 4x and lets XLA's gather emitter move wider
contiguous slices — the dominant cost on TPU, where random access runs far
below HBM bandwidth.

Backward: analytic gradients matching the reference backward kernel
(kernels.py:477-553):
  * attention_weights_grad = <out_grad, samples>_C           (kernels.py:492-503)
  * sampling_points_grad via the bilinear derivative with the
    align_corners-dependent scale                            (kernels.py:509-537)
  * img_grad as a 2x2-patch scatter-add (the XLA analogue of the reference's
    four ``tl.atomic_add`` calls, kernels.py:549-553)
The forward is rematerialized in the backward (no saved samples), matching
the reference memory-parity property (kernels.py:421).

This path requires *static* pyramid level shapes (it reshapes each level to
[B, H, h, w, C]); the dispatch layer falls back to the reference row-gather
path when ``img_shapes`` is traced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_multiscale_deformable_attention", "fused_msda_vjp"]


def _static_shapes(img_shapes):
    """Return img_shapes as a concrete numpy [L, 2] array, or None if traced."""
    if isinstance(img_shapes, jax.core.Tracer):
        return None
    return np.asarray(jax.device_get(img_shapes)).astype(np.int64)


def _level_views(img, shapes):
    """Split [B, I, H, C] into per-level [B, H, h, w, C] views.

    Levels with an extent of 1 are zero-padded to 2 so the fixed-size
    2x2-patch gather/scatter (slice_sizes=(...,2,2,...)) stays in bounds;
    the padded row/column is never *selected* (corner indices are clamped
    to the true extent) so values and gradients are unaffected.
    """
    B, I, H, C = img.shape  # noqa: E741
    views = []
    start = 0
    for h, w in shapes:
        h, w = int(h), int(w)
        lvl = jax.lax.slice_in_dim(img, start, start + h * w, axis=1)
        view = lvl.reshape(B, h, w, H, C).transpose(0, 3, 1, 2, 4)
        if h < 2 or w < 2:
            view = jnp.pad(
                view,
                [(0, 0), (0, 0), (0, max(2 - h, 0)), (0, max(2 - w, 0)),
                 (0, 0)],
            )
        views.append(view)
        start += h * w
    return views


def _patch_coords(pts_l, h, w, align_corners, compute_dtype):
    """Per-level bilinear geometry.

    pts_l: [B, N, H, P, 2] normalized (x, y).
    Returns (sy, sx) int32 patch starts clipped to [0, extent-2] and the
    2x2 patch weight tensor wpatch [B, N, H, P, 2, 2] that includes the
    corner clamping / OOB masking, plus (dx, dy, corner one-hots) needed by
    the backward.
    """
    x = pts_l[..., 0].astype(compute_dtype)
    y = pts_l[..., 1].astype(compute_dtype)
    if align_corners:
        x = x * (w - 1.0)
        y = y * (h - 1.0)
    else:
        x = x * w - 0.5
        y = y * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    wi, hi = int(w), int(h)
    # Patch start: clipped so [s, s+1] stays inside the (possibly padded,
    # see _level_views) view; max(extent-2, 0) keeps 1-pixel extents at 0.
    sx = jnp.clip(x0i, 0, max(wi - 2, 0))
    sy = jnp.clip(y0i, 0, max(hi - 2, 0))
    # Positions of the four (possibly clamped) corners inside the patch.
    x0c = jnp.clip(x0i, 0, wi - 1) - sx   # in {0, 1}
    x1c = jnp.clip(x0i + 1, 0, wi - 1) - sx
    y0c = jnp.clip(y0i, 0, hi - 1) - sy
    y1c = jnp.clip(y0i + 1, 0, hi - 1) - sy
    return x0i, y0i, sx, sy, x0c, x1c, y0c, y1c, dx, dy


def _corner_weights(x0i, y0i, dx, dy, h, w, padding_mode, compute_dtype):
    """Scalar lerp weights per corner, with zeros-mode OOB masking
    (reference kernels.py:156-162, 220-231).  Shapes: [B, N, H, P]."""
    one = jnp.ones((), compute_dtype)
    if padding_mode == "zeros":
        mx0 = ((x0i >= 0) & (x0i < w)).astype(compute_dtype)
        mx1 = ((x0i + 1 >= 0) & (x0i + 1 < w)).astype(compute_dtype)
        my0 = ((y0i >= 0) & (y0i < h)).astype(compute_dtype)
        my1 = ((y0i + 1 >= 0) & (y0i + 1 < h)).astype(compute_dtype)
    else:
        mx0 = mx1 = my0 = my1 = one
    c00 = my0 * mx0 * (1.0 - dy) * (1.0 - dx)
    c01 = my0 * mx1 * (1.0 - dy) * dx
    c10 = my1 * mx0 * dy * (1.0 - dx)
    c11 = my1 * mx1 * dy * dx
    return c00, c01, c10, c11


def _patch_onehots(x0c, x1c, y0c, y1c, compute_dtype):
    """One-hot [.., 2] position selectors of each corner inside the patch."""
    ix = jnp.arange(2, dtype=jnp.int32)
    ohx0 = (ix == x0c[..., None]).astype(compute_dtype)  # [B,N,H,P,2]
    ohx1 = (ix == x1c[..., None]).astype(compute_dtype)
    ohy0 = (ix == y0c[..., None]).astype(compute_dtype)
    ohy1 = (ix == y1c[..., None]).astype(compute_dtype)
    return ohx0, ohx1, ohy0, ohy1


def _patch_weight_grid(cs, onehots):
    """Combine corner scalar weights with their patch positions into the
    [B, N, H, P, 2, 2] patch weight grid."""
    c00, c01, c10, c11 = cs
    ohx0, ohx1, ohy0, ohy1 = onehots
    def outer(ohy, ohx):
        return ohy[..., :, None] * ohx[..., None, :]
    return (
        c00[..., None, None] * outer(ohy0, ohx0)
        + c01[..., None, None] * outer(ohy0, ohx1)
        + c10[..., None, None] * outer(ohy1, ohx0)
        + c11[..., None, None] * outer(ohy1, ohx1)
    )


_GATHER_DNUMS = None


def _gather_patches(lvl, sy, sx, C):
    """lvl [B, H, h, w, C]; sy/sx [B, N, H, P] -> patches [B, N, H, P, 2, 2, C]."""
    B, H, h, w, _ = lvl.shape
    _, N, _, P = sy.shape
    idx = jnp.stack(
        [
            sy.transpose(0, 2, 1, 3).reshape(B, H, N * P),
            sx.transpose(0, 2, 1, 3).reshape(B, H, N * P),
        ],
        axis=-1,
    )
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(3, 4, 5),
        collapsed_slice_dims=(),
        start_index_map=(2, 3),
        operand_batching_dims=(0, 1),
        start_indices_batching_dims=(0, 1),
    )
    patch = jax.lax.gather(
        lvl,
        idx,
        dn,
        slice_sizes=(1, 1, 2, 2, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        indices_are_sorted=False,
        unique_indices=False,
    )  # [B, H, N*P, 2, 2, C]
    return patch.reshape(B, H, N, P, 2, 2, C).transpose(0, 2, 1, 3, 4, 5, 6)


def _scatter_add_patches(acc, updates, sy, sx):
    """Scatter-add updates [B, N, H, P, 2, 2, C] into acc [B, H, h, w, C]."""
    B, H, h, w, C = acc.shape
    _, N, _, P = sy.shape
    idx = jnp.stack(
        [
            sy.transpose(0, 2, 1, 3).reshape(B, H, N * P),
            sx.transpose(0, 2, 1, 3).reshape(B, H, N * P),
        ],
        axis=-1,
    )
    upd = updates.transpose(0, 2, 1, 3, 4, 5, 6).reshape(B, H, N * P, 2, 2, C)
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(3, 4, 5),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(2, 3),
        operand_batching_dims=(0, 1),
        scatter_indices_batching_dims=(0, 1),
    )
    return jax.lax.scatter_add(
        acc,
        idx,
        upd,
        dn,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        indices_are_sorted=False,
        unique_indices=False,
    )


def fused_multiscale_deformable_attention(
    img, img_shapes, sampling_points, attention_weights,
    padding_mode: str = "border", align_corners: bool = False,
):
    """Forward pass.  See module docstring.  Shapes as in msda.py."""
    shapes = _static_shapes(img_shapes)
    if shapes is None:
        from .reference import native_multiscale_deformable_attention

        return native_multiscale_deformable_attention(
            img, img_shapes, sampling_points, attention_weights,
            padding_mode, align_corners,
        )

    B, I, H, C = img.shape  # noqa: E741
    _, N, _, L, P, _ = sampling_points.shape
    compute_dtype = jnp.promote_types(sampling_points.dtype, jnp.float32)

    levels = _level_views(img, shapes)
    out = jnp.zeros((B, N, H, C), compute_dtype)
    for lvl_idx in range(L):
        h, w = int(shapes[lvl_idx, 0]), int(shapes[lvl_idx, 1])
        pts_l = sampling_points[:, :, :, lvl_idx]   # [B, N, H, P, 2]
        wts_l = attention_weights[:, :, :, lvl_idx].astype(compute_dtype)
        x0i, y0i, sx, sy, x0c, x1c, y0c, y1c, dx, dy = _patch_coords(
            pts_l, float(h), float(w), align_corners, compute_dtype
        )
        cs = _corner_weights(x0i, y0i, dx, dy, h, w, padding_mode, compute_dtype)
        ohs = _patch_onehots(x0c, x1c, y0c, y1c, compute_dtype)
        wpatch = _patch_weight_grid(cs, ohs)  # [B, N, H, P, 2, 2]
        patches = _gather_patches(levels[lvl_idx], sy, sx, C)
        # weighted reduce over (P, 2, 2):
        out = out + jnp.einsum(
            "bnhpyxc,bnhpyx,bnhp->bnhc",
            patches.astype(compute_dtype),
            wpatch,
            wts_l,
        )
    return out.astype(img.dtype)


def fused_msda_vjp(
    img, img_shapes, sampling_points, attention_weights, out_grad,
    padding_mode: str, align_corners: bool,
):
    """Analytic VJP; rematerializes the forward gathers.

    Returns (img_grad, sampling_points_grad, attention_weights_grad), the
    same triple as the reference backward host wrapper (kernels.py:592).
    """
    shapes = _static_shapes(img_shapes)
    if shapes is None:
        from .reference import native_multiscale_deformable_attention

        _, vjp = jax.vjp(
            lambda i, p, w: native_multiscale_deformable_attention(
                i, img_shapes, p, w, padding_mode, align_corners
            ),
            img, sampling_points, attention_weights,
        )
        return vjp(out_grad)

    B, I, H, C = img.shape  # noqa: E741
    _, N, _, L, P, _ = sampling_points.shape
    compute_dtype = jnp.promote_types(sampling_points.dtype, jnp.float32)
    og = out_grad.astype(compute_dtype)  # [B, N, H, C]

    levels = _level_views(img, shapes)
    img_grad_levels = []
    pts_grads = []
    wts_grads = []
    for lvl_idx in range(L):
        h, w = int(shapes[lvl_idx, 0]), int(shapes[lvl_idx, 1])
        pts_l = sampling_points[:, :, :, lvl_idx]
        wts_l = attention_weights[:, :, :, lvl_idx].astype(compute_dtype)
        x0i, y0i, sx, sy, x0c, x1c, y0c, y1c, dx, dy = _patch_coords(
            pts_l, float(h), float(w), align_corners, compute_dtype
        )
        cs = _corner_weights(x0i, y0i, dx, dy, h, w, padding_mode, compute_dtype)
        ohs = _patch_onehots(x0c, x1c, y0c, y1c, compute_dtype)
        ohx0, ohx1, ohy0, ohy1 = ohs
        patches = _gather_patches(levels[lvl_idx], sy, sx, C).astype(compute_dtype)

        # corner values [B, N, H, P, C] (masked for zeros mode is implicit in
        # the corner weights; for the coordinate grads we need the masked
        # values explicitly, reference kernels.py:228-231)
        def pick(ohy, ohx):
            return jnp.einsum("bnhpyxc,bnhpy,bnhpx->bnhpc", patches, ohy, ohx)

        v00 = pick(ohy0, ohx0)
        v01 = pick(ohy0, ohx1)
        v10 = pick(ohy1, ohx0)
        v11 = pick(ohy1, ohx1)
        if padding_mode == "zeros":
            mx0 = ((x0i >= 0) & (x0i < w)).astype(compute_dtype)[..., None]
            mx1 = ((x0i + 1 >= 0) & (x0i + 1 < w)).astype(compute_dtype)[..., None]
            my0 = ((y0i >= 0) & (y0i < h)).astype(compute_dtype)[..., None]
            my1 = ((y0i + 1 >= 0) & (y0i + 1 < h)).astype(compute_dtype)[..., None]
            v00 = v00 * (my0 * mx0)
            v01 = v01 * (my0 * mx1)
            v10 = v10 * (my1 * mx0)
            v11 = v11 * (my1 * mx1)

        dxe = dx[..., None]
        dye = dy[..., None]
        samples = (
            v00 * (1 - dye) * (1 - dxe)
            + v01 * (1 - dye) * dxe
            + v10 * dye * (1 - dxe)
            + v11 * dye * dxe
        )  # [B, N, H, P, C]

        # attention weights grad  (kernels.py:492-503)
        wts_grads.append(jnp.einsum("bnhpc,bnhc->bnhp", samples, og))

        # sampling point grads  (kernels.py:509-537)
        x_scale = (w - 1.0) if align_corners else float(w)
        y_scale = (h - 1.0) if align_corners else float(h)
        og_w = og[:, :, :, None, :] * wts_l[..., None]  # [B, N, H, P, C]
        gx = x_scale * jnp.sum(
            og_w * ((1 - dye) * (v01 - v00) + dye * (v11 - v10)), axis=-1
        )
        gy = y_scale * jnp.sum(
            og_w * ((1 - dxe) * (v10 - v00) + dxe * (v11 - v01)), axis=-1
        )
        pts_grads.append(jnp.stack([gx, gy], axis=-1))  # [B, N, H, P, 2]

        # img grad: 2x2-patch scatter-add  (kernels.py:543-553)
        wpatch = _patch_weight_grid(cs, ohs)  # [B, N, H, P, 2, 2]
        updates = (
            wpatch[..., None] * og_w[:, :, :, :, None, None, :]
        )  # [B, N, H, P, 2, 2, C]
        h2, w2 = max(h, 2), max(w, 2)
        acc = jnp.zeros((B, H, h2, w2, C), compute_dtype)
        acc = _scatter_add_patches(acc, updates, sy, sx)
        acc = acc[:, :, :h, :w]  # drop 1-pixel-extent padding (never hit)
        img_grad_levels.append(
            acc.transpose(0, 2, 3, 1, 4).reshape(B, h * w, H, C)
        )

    img_grad = jnp.concatenate(img_grad_levels, axis=1).astype(img.dtype)
    pts_grad = jnp.stack(pts_grads, axis=3).astype(sampling_points.dtype)
    wts_grad = jnp.stack(wts_grads, axis=3).astype(attention_weights.dtype)
    return img_grad, pts_grad, wts_grad
