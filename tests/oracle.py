"""Independent torch oracle for multiscale deformable attention.

The test strategy mirrors the reference's (/root/reference/tests/test_msda.py):
validate every implementation against an *independent* torch implementation
built on ``torch.nn.functional.grid_sample``, which is the ground truth for
padding_mode / align_corners semantics (the reference uses a HuggingFace
Grounding-DINO-derived oracle the same way, test_msda.py:190-246).

This oracle is torch-CPU and supports float16/32/64, so the jax interpreter
path can be checked bit-closely in f64.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def torch_msda_oracle(
    img: np.ndarray,
    img_shapes: np.ndarray,
    sampling_points: np.ndarray,
    attention_weights: np.ndarray,
    padding_mode: str,
    align_corners: bool,
) -> np.ndarray:
    """Numpy-in / numpy-out torch grid_sample oracle.

    Shapes: img [B, I, H, C], img_shapes [L, 2] (h, w), sampling_points
    [B, N, H, L, P, 2] in [0, 1] (x, y), attention_weights [B, N, H, L, P].
    Returns [B, N, H, C].
    """
    img_t = torch.from_numpy(np.asarray(img))
    pts_t = torch.from_numpy(np.asarray(sampling_points))
    wts_t = torch.from_numpy(np.asarray(attention_weights))
    shapes = np.asarray(img_shapes)

    B, I, H, C = img_t.shape  # noqa: E741
    _, N, _, L, P, _ = pts_t.shape

    # grid_sample wants [-1, 1] grid coords.
    grids = 2.0 * pts_t - 1.0

    level_sizes = [int(h * w) for h, w in shapes]
    levels = torch.split(img_t, level_sizes, dim=1)

    out = torch.zeros(B, N, H, C, dtype=img_t.dtype)
    for lvl in range(L):
        h, w = int(shapes[lvl, 0]), int(shapes[lvl, 1])
        # [B, h*w, H, C] -> [B*H, C, h, w]
        value = (
            levels[lvl]
            .reshape(B, h, w, H, C)
            .permute(0, 3, 4, 1, 2)
            .reshape(B * H, C, h, w)
        )
        # [B, N, H, P, 2] -> [B*H, N, P, 2]
        grid = grids[:, :, :, lvl].permute(0, 2, 1, 3, 4).reshape(B * H, N, P, 2)
        sampled = F.grid_sample(
            value,
            grid,
            mode="bilinear",
            padding_mode=padding_mode,
            align_corners=align_corners,
        )  # [B*H, C, N, P]
        sampled = sampled.reshape(B, H, C, N, P)
        w_lvl = wts_t[:, :, :, lvl]  # [B, N, H, P]
        out += torch.einsum("bhcnp,bnhp->bnhc", sampled, w_lvl)
    return out.numpy()


def torch_msda_oracle_grads(
    img,
    img_shapes,
    sampling_points,
    attention_weights,
    out_grad,
    padding_mode: str,
    align_corners: bool,
):
    """Oracle gradients via torch autograd. Returns (out, img_grad,
    sampling_points_grad, attention_weights_grad) as numpy arrays."""
    img_t = torch.from_numpy(np.asarray(img)).requires_grad_(True)
    pts_t = torch.from_numpy(np.asarray(sampling_points)).requires_grad_(True)
    wts_t = torch.from_numpy(np.asarray(attention_weights)).requires_grad_(True)
    shapes = np.asarray(img_shapes)
    og = torch.from_numpy(np.asarray(out_grad))

    B, I, H, C = img_t.shape  # noqa: E741
    _, N, _, L, P, _ = pts_t.shape
    grids = 2.0 * pts_t - 1.0
    level_sizes = [int(h * w) for h, w in shapes]
    levels = torch.split(img_t, level_sizes, dim=1)

    out = torch.zeros(B, N, H, C, dtype=img_t.dtype)
    for lvl in range(L):
        h, w = int(shapes[lvl, 0]), int(shapes[lvl, 1])
        value = (
            levels[lvl]
            .reshape(B, h, w, H, C)
            .permute(0, 3, 4, 1, 2)
            .reshape(B * H, C, h, w)
        )
        grid = grids[:, :, :, lvl].permute(0, 2, 1, 3, 4).reshape(B * H, N, P, 2)
        sampled = F.grid_sample(
            value,
            grid,
            mode="bilinear",
            padding_mode=padding_mode,
            align_corners=align_corners,
        ).reshape(B, H, C, N, P)
        out = out + torch.einsum("bhcnp,bnhp->bnhc", sampled, wts_t[:, :, :, lvl])

    out.backward(og)
    return (
        out.detach().numpy(),
        img_t.grad.numpy(),
        pts_t.grad.numpy(),
        wts_t.grad.numpy(),
    )
