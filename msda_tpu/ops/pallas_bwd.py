"""Pallas TPU backward kernel for multiscale deformable attention.

Mirrors the reference backward design (/root/reference/src/msda_triton/
kernels.py:395-553): the forward's interpolation structure is
*rematerialized* in-kernel (no saved activations, kernels.py:421), then the
three input gradients are produced:

  * ``attention_weights_grad[p] = <out_grad, unweighted sample_p>``
                                                     (kernels.py:492-503)
  * ``sampling_points_grad`` via the analytic bilinear derivative with the
    align_corners-dependent coordinate scale         (kernels.py:509-537)
  * ``img_grad`` — where the reference needs four cross-program
    ``tl.atomic_add`` scatters (kernels.py:549-553), here it is the MXU
    transpose of the forward contraction,

        img_grad[i, c] += sum_q A[i, q] * out_grad[q, c],

    accumulated in VMEM across the *sequential* query-block grid steps —
    no atomics needed because TPU grid steps on a core execute in order.

The per-point gradients use one shared MXU product
``G[i, q] = sum_c E[i, c] * out_grad[q, c]`` and then contract G against
the 2-sparse row factors of each point on the VPU:

    RowY[y, q]  = sum_x Vx[x, q]  * G[(y, x), q]     (x-lerp row sums)
    RowYd[y, q] = sum_x Vx'[x, q] * G[(y, x), q]     (x-derivative row sums)
    wg_p = sum_y Wy[y, q]  * RowY[y, q]
    gx_p = xscale * w_p * sum_y Wy[y, q]  * RowYd[y, q]
    gy_p = yscale * w_p * sum_y Wy'[y, q] * RowY[y, q]

which is exactly the analytic derivative of the separable bilinear lerp.
The segmented x-reductions are free-form reshapes because levels are laid
out at sublane-padded pitch (see pallas_fwd.level_layout).

Precision follows the forward: f32 inputs use exact two-way bf16 splits of
E / A / out_grad with 3 MXU passes per contraction (~2^-17 relative);
bf16 inputs use single passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fwd import (
    INTERPRET,
    _round_up,
    assemble_a_parts,
    build_e_matrix,
    level_layout,
    make_sparse_factor,
    point_geometry,
    prepare_inputs,
    resolve_n_split,
    split_bf16,
    split_bf16_xla,
)

__all__ = ["pallas_msda_bwd"]

# queries per grid step.  Smaller than the forward's: the backward holds
# G [ipad, nblk] f32 plus the A parts concurrently, and larger blocks push
# past the VMEM sweet spot (measured: 512 beats 256 and 1024 here).
N_BLOCK = 512

_I32 = jnp.int32
_F32 = jnp.float32


def _bwd_kernel(
    x_ref, y_ref, wt_ref,
    og_ref, ecat_ref,
    wg_ref, gx_ref, gy_ref, ig_ref,
    *, level_dims, level_offs, pitches, ipad, C, nblk, n_split,
    padding_mode, align_corners, exact,
):
    L = len(level_dims)
    P = wt_ref.shape[3]
    nb = pl.program_id(1)
    hi_prec = jax.lax.Precision.HIGHEST

    og = og_ref[0, 0].astype(_F32)              # [nblk, C]
    dn_c = (((1,), (1,)), ((), ()))
    if exact:
        # interpreter/debug path: f32 operands, highest-precision dots
        G = jax.lax.dot_general(
            ecat_ref[0, 0], og, dn_c, precision=hi_prec,
            preferred_element_type=_F32,
        )
    else:
        og_parts = split_bf16(og, n_split)
        # G[i, q] = sum_c E[i, c] * og[q, c] — a single dot stacked along
        # the contracted C axis with all n^2 (E_i, og_j) part pairs
        # (ecat column slab (i, j) holds E_i; see _pallas_bwd).  One dot,
        # not a sum of dots: see pallas_fwd.assemble_a_parts.
        og_cat = jnp.concatenate(
            [og_parts[j] for _ in range(n_split) for j in range(n_split)],
            axis=1,
        )  # [nblk, n_split^2*C]
        G = jax.lax.dot_general(
            ecat_ref[0, 0], og_cat, dn_c, preferred_element_type=_F32
        )

    xin = x_ref[0, 0]
    yin = y_ref[0, 0]
    wt = wt_ref[0, 0]

    # One fused pass per (level, point): the per-point gradient reductions
    # and the rematerialized A level blocks (for img_grad) share the same
    # 2-sparse factors, and the A outer products are independent of G so
    # the scheduler can overlap them with the G contraction above.
    blocks = []
    for li, (h, w) in enumerate(level_dims):
        w8 = pitches[li]
        off = level_offs[li]
        Gl = G[off:off + h * w8, :].reshape(h, w8, nblk)
        if align_corners:
            xsc = np.float32(w - 1)
            ysc = np.float32(h - 1)
        else:
            xsc = np.float32(w)
            ysc = np.float32(h)
        acc = None
        for p in range(P):
            (x0c, x1c, y0c, y1c, vx0, vx1, uy0, uy1,
             mx0, mx1, my0, my1) = point_geometry(
                xin[li, p][None], yin[li, p][None], h, w,
                padding_mode, align_corners,
            )
            vx = make_sparse_factor(
                x0c[0], x1c[0], vx0[0], vx1[0], w, w8, nblk
            )
            vxd = make_sparse_factor(
                x0c[0], x1c[0], (-mx0)[0], mx1[0], w, w8, nblk
            )
            wy = make_sparse_factor(
                y0c[0], y1c[0], uy0[0], uy1[0], h, h, nblk
            )
            wyd = make_sparse_factor(
                y0c[0], y1c[0], (-my0)[0], my1[0], h, h, nblk
            )
            rowy = jnp.sum(Gl * vx[None], axis=1)    # [h, nblk]
            rowyd = jnp.sum(Gl * vxd[None], axis=1)  # [h, nblk]
            wg_ref[0, 0, li, p] = jnp.sum(wy * rowy, axis=0)
            wtp = wt[li, p]
            gx_ref[0, 0, li, p] = xsc * wtp * jnp.sum(wy * rowyd, axis=0)
            gy_ref[0, 0, li, p] = ysc * wtp * jnp.sum(wyd * rowy, axis=0)
            # weighted A contribution (img_grad remat), reusing wy/vx
            term = (wy * wtp[None])[:, None, :] * vx[None, :, :]
            acc = term if acc is None else acc + term
        blocks.append(acc.reshape(h * w8, nblk))
    dn_q = (((1,), (0,)), ((), ()))
    if exact:
        a_cat = assemble_a_parts(
            blocks, ipad=ipad, nblk=nblk, n_split=1, exact=True
        )
        ig = jax.lax.dot_general(
            a_cat, og, dn_q, precision=hi_prec,
            preferred_element_type=_F32,
        )
    else:
        # A parts stacked along the contracted query axis (columns), og
        # parts column-stacked then row-replicated — the same complete
        # split-product trick as the forward (pallas_fwd.build_e_wide),
        # transposed: out column block k = (sum_s A_s) @ og_k.  One dot
        # per level so the MXU overlaps the VPU work above.
        og_cols = jnp.concatenate(og_parts, axis=1)  # [nblk, n_split*C]
        og_wide = (
            og_cols if n_split == 1
            else jnp.concatenate([og_cols] * n_split, axis=0)
        )  # [n_split*nblk, n_split*C]
        ig_rows = []
        for li, blk in enumerate(blocks):
            parts = split_bf16(blk, n_split)
            a_lq = (
                parts[0] if n_split == 1
                else jnp.concatenate(parts, axis=1)
            )  # [rows, n_split*nblk]
            igw = jax.lax.dot_general(
                a_lq, og_wide, dn_q, preferred_element_type=_F32
            )  # [rows, n_split*C]
            ig_l = igw[:, :C]
            for k in range(1, n_split):
                ig_l = ig_l + igw[:, k * C:(k + 1) * C]
            ig_rows.append(ig_l)
        tail = ipad - sum(b.shape[0] for b in blocks)
        if tail:
            ig_rows.append(jnp.zeros((tail, C), _F32))
        ig = jnp.concatenate(ig_rows, axis=0)

    @pl.when(nb == 0)
    def _():
        ig_ref[0, 0] = ig

    @pl.when(nb != 0)
    def _():
        ig_ref[0, 0] = ig_ref[0, 0] + ig


@functools.partial(
    jax.jit,
    static_argnames=(
        "shapes_tuple", "padding_mode", "align_corners", "n_split", "interpret",
    ),
)
def _pallas_bwd(
    img, sampling_points, attention_weights, out_grad,
    *, shapes_tuple, padding_mode, align_corners, n_split, interpret,
):
    B, I, H, C = img.shape  # noqa: E741
    _, N, _, L, P, _ = sampling_points.shape
    shapes = np.asarray(shapes_tuple, np.int64)
    level_offs, pitches, ipad = level_layout(shapes)
    level_dims = tuple((int(h), int(w)) for h, w in shapes)

    geom = prepare_inputs(sampling_points, attention_weights)
    n_pad = _round_up(N, N_BLOCK)
    if n_pad != N:
        pad = [(0, 0)] * 4 + [(0, n_pad - N)]
        geom = tuple(jnp.pad(t, pad) for t in geom)

    og = out_grad.astype(_F32).transpose(0, 2, 1, 3)  # [B, H, N, C]
    if n_pad != N:
        og = jnp.pad(og, [(0, 0), (0, 0), (0, n_pad - N), (0, 0)])

    e = build_e_matrix(img, shapes)
    exact = bool(interpret)
    if exact:
        e_cat = e  # exact f32 path (see _bwd_kernel)
        ecdim = C
    else:
        e_parts = split_bf16_xla(e, n_split)
        # column slab (i, j) holds E_i, paired with og_j by the kernel's
        # og_cat — all n^2 part pairs of the G contraction in one dot
        e_cat = jnp.concatenate(
            [e_parts[i] for i in range(n_split) for _ in range(n_split)],
            axis=3,
        )
        ecdim = n_split * n_split * C

    grid = (B * H, n_pad // N_BLOCK)

    def pt_spec():
        return pl.BlockSpec(
            (1, 1, L, P, N_BLOCK),
            lambda bh, nb: (bh // H, bh % H, 0, 0, nb),
            memory_space=pltpu.VMEM,
        )

    def og_spec():
        return pl.BlockSpec(
            (1, 1, N_BLOCK, C),
            lambda bh, nb: (bh // H, bh % H, nb, 0),
            memory_space=pltpu.VMEM,
        )

    def e_spec():
        return pl.BlockSpec(
            (1, 1, ipad, ecdim),
            lambda bh, nb: (bh // H, bh % H, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def ig_spec():
        return pl.BlockSpec(
            (1, 1, ipad, C),
            lambda bh, nb: (bh // H, bh % H, 0, 0),
            memory_space=pltpu.VMEM,
        )

    kernel = functools.partial(
        _bwd_kernel,
        level_dims=level_dims,
        level_offs=tuple(level_offs),
        pitches=tuple(pitches),
        ipad=ipad,
        C=C,
        nblk=N_BLOCK,
        n_split=n_split,
        padding_mode=padding_mode,
        align_corners=bool(align_corners),
        exact=exact,
    )

    wg, gx, gy, ig = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pt_spec() for _ in range(3)] + [og_spec(), e_spec()],
        out_specs=[pt_spec(), pt_spec(), pt_spec(), ig_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, L, P, n_pad), _F32),
            jax.ShapeDtypeStruct((B, H, L, P, n_pad), _F32),
            jax.ShapeDtypeStruct((B, H, L, P, n_pad), _F32),
            jax.ShapeDtypeStruct((B, H, ipad, C), _F32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*geom, og, e_cat)

    def fold_pts(t):  # [B, H, L, P, n_pad] -> [B, N, H, L, P]
        return t[..., :N].transpose(0, 4, 1, 2, 3)

    wg = fold_pts(wg)
    pts_grad = jnp.stack([fold_pts(gx), fold_pts(gy)], axis=-1)

    # reassemble img grad from the padded-pitch layout
    parts = []
    for li, (h, w) in enumerate(level_dims):
        w8 = pitches[li]
        off = level_offs[li]
        g = jax.lax.slice_in_dim(ig, off, off + h * w8, axis=2)
        if w8 != w:
            g = g.reshape(B, H, h, w8, C)[:, :, :, :w, :].reshape(B, H, h * w, C)
        parts.append(g)
    img_grad = jnp.concatenate(parts, axis=2).transpose(0, 2, 1, 3)

    return (
        img_grad.astype(img.dtype),
        pts_grad.astype(sampling_points.dtype),
        wg.astype(attention_weights.dtype),
    )


def pallas_msda_bwd(
    img, img_shapes, sampling_points, attention_weights, out_grad,
    padding_mode: str = "border", align_corners: bool = False,
    precision=None, interpret: bool | None = None,
):
    """Pallas TPU backward: returns (img_grad, sampling_points_grad,
    attention_weights_grad) — the reference backward triple
    (kernels.py:592)."""
    shapes = np.asarray(jax.device_get(img_shapes)).astype(np.int64)
    shapes_tuple = tuple((int(h), int(w)) for h, w in shapes)
    if interpret is None:
        interpret = INTERPRET
    # x64 disabled for the trace — see pallas_fwd (Mosaic 64-bit convert
    # helper recursion); all kernel I/O is explicit f32/int32 regardless.
    with jax.enable_x64(False):
        return _pallas_bwd(
            img, sampling_points, attention_weights, out_grad,
            shapes_tuple=shapes_tuple,
            padding_mode=padding_mode,
            align_corners=bool(align_corners),
            n_split=resolve_n_split(img.dtype, precision),
            interpret=bool(interpret),
        )
