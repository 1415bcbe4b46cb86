"""Pallas TPU backward kernel for multiscale deformable attention.

Mirrors the reference backward design (/root/reference/src/msda_triton/
kernels.py:395-553): the forward bilinear sampling is *rematerialized*
in-kernel (no saved activations, kernels.py:421), then the three input
gradients are produced:

  * ``attention_weights_grad[k] = <out_grad, samples[k]>``  (kernels.py:492-503)
  * ``sampling_points_grad`` via the analytic bilinear derivative with the
    align_corners-dependent coordinate scale                (kernels.py:509-537)
  * ``img_grad`` — where the reference needs four cross-program
    ``tl.atomic_add`` scatters (kernels.py:549-553), the TPU formulation is
    a *matmul*: for each level,

        img_grad[x, (c, y)] = sum_k V[x, k] * G[(c, y), k],
        G[(c, y), k] = wt_k * Wy[(c, y), k] * out_grad[c, n(k)]

    i.e. the transpose of the forward's stage-1 contraction, computed on the
    MXU with the query axis as the (large) contraction dimension, and
    accumulated in VMEM across the sequential inner grid steps — no atomics
    needed because TPU grid steps on a core execute in order.

Data layout follows pallas_fwd.py's transposed scheme: query-points on the
lane axis, c-major ([w, C*h]) level images, masks built in
[extent, P, n_block] space and lane-merged with free (inner-128) reshapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_fwd as _pf
from .pallas_fwd import _level_mats, _round_up, N_BLOCK, make_sublevels

__all__ = ["pallas_msda_bwd"]


def _prepare_raw_geometry(
    sampling_points, shapes, align_corners, sublevels,
    compute_dtype=jnp.float32,
):
    """Elementwise prep: unclamped floor corners, fractional offsets, and
    the row-band assignment mask (see pallas_fwd.make_sublevels).

    Returns (x0, y0 int32 [band-local]; dx, dy, bmask compute_dtype), each
    [B, H, S, P, N].
    """
    B, N, H, L, P, _ = sampling_points.shape
    pts = sampling_points.astype(compute_dtype)
    hs = jnp.asarray(shapes[:, 0], compute_dtype)[None, None, None, :, None]
    ws = jnp.asarray(shapes[:, 1], compute_dtype)[None, None, None, :, None]
    x = pts[..., 0]
    y = pts[..., 1]
    if align_corners:
        x = x * (ws - 1.0)
        y = y * (hs - 1.0)
    else:
        x = x * ws - 0.5
        y = y * hs - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)

    def to_kernel_layout(t):
        return t.transpose(0, 2, 3, 4, 1)  # [B, H, L, P, N]

    x0 = to_kernel_layout(x0f.astype(jnp.int32))
    y0 = to_kernel_layout(y0f.astype(jnp.int32))
    dx = to_kernel_layout(x - x0f)
    dy = to_kernel_layout(y - y0f)

    xs0, ys0, dxs, dys, masks = [], [], [], [], []
    one = jnp.ones(x0.shape[:2] + x0.shape[3:], compute_dtype)
    for lvl, off, band_h, _, level_h in sublevels:
        y0_l = y0[:, :, lvl]
        y0c = jnp.clip(y0_l, 0, level_h - 1)
        if level_h <= band_h:
            mask = one
        else:
            upper = off + (band_h - 1) if off + band_h < level_h else level_h
            mask = ((y0c >= off) & (y0c < upper)).astype(compute_dtype)
        xs0.append(x0[:, :, lvl])
        ys0.append(y0_l - off)
        dxs.append(dx[:, :, lvl])
        dys.append(dy[:, :, lvl])
        masks.append(mask)

    stack = lambda ts: jnp.stack(ts, axis=2)  # noqa: E731
    return stack(xs0), stack(ys0), stack(dxs), stack(dys), stack(masks)


def _bwd_kernel(
    # inputs
    x0_ref, y0_ref, dx_ref, dy_ref, wt_ref, bm_ref, og_ref,
    *emat_and_outs,
    # static
    level_shapes, P, C, precision, padding_mode, align_corners,
):
    L = len(level_shapes)
    emat_refs = emat_and_outs[:L]
    wg_ref = emat_and_outs[L]        # [1, 1, L, P, nblk] attention-weights grad
    gx_ref = emat_and_outs[L + 1]    # [1, 1, L, P, nblk] x-coordinate grad
    gy_ref = emat_and_outs[L + 2]    # [1, 1, L, P, nblk] y-coordinate grad
    ig_refs = emat_and_outs[L + 3:]  # per-level [1, 1, w, C*h] img grads

    nblk = N_BLOCK
    kblk = nblk * P
    nb = pl.program_id(1)

    og_nT = og_ref[0, 0, :, :].astype(jnp.float32)   # [C, nblk]
    # queries -> points on lanes (k = p * nblk + n, matching the V build)
    og_kT = jnp.tile(og_nT, (1, P))                  # [C, kblk]

    zeros_mode = padding_mode == "zeros"

    for lvl in range(L):
        h, w, level_h = level_shapes[lvl]
        x0 = x0_ref[0, 0, lvl][None]   # [1, P, nblk] int32 unclamped floor
        y0 = y0_ref[0, 0, lvl][None]
        dx = dx_ref[0, 0, lvl][None]
        dy = dy_ref[0, 0, lvl][None]
        wt = wt_ref[0, 0, lvl][None]   # attention weight
        bm = bm_ref[0, 0, lvl][None]   # row-band assignment mask

        if zeros_mode:
            mx0 = ((x0 >= 0) & (x0 < w)).astype(jnp.float32)
            mx1 = ((x0 + 1 >= 0) & (x0 + 1 < w)).astype(jnp.float32)
            # y-range masks use band-local coords; valid because each point
            # is assigned (via bm) to the band containing both its rows
            my0 = bm * ((y0 >= 0) & (y0 < h)).astype(jnp.float32)
            my1 = bm * ((y0 + 1 >= 0) & (y0 + 1 < h)).astype(jnp.float32)
        else:
            mx0 = mx1 = jnp.ones((1, P, nblk), jnp.float32)
            my0 = my1 = bm

        x0c = jnp.clip(x0, 0, w - 1)
        x1c = jnp.clip(x0 + 1, 0, w - 1)
        xi = jax.lax.broadcasted_iota(jnp.int32, (w, P, nblk), 0)
        oh_x0 = xi == x0c
        oh_x1 = xi == x1c
        # forward x-lerp columns and their x-derivative columns
        VT = (
            jnp.where(oh_x0, (1.0 - dx) * mx0, 0.0)
            + jnp.where(oh_x1, dx * mx1, 0.0)
        ).reshape(w, kblk)
        VpT = (
            jnp.where(oh_x1, mx1, 0.0) - jnp.where(oh_x0, mx0, 0.0)
        ).reshape(w, kblk)

        E = emat_refs[lvl][0, 0]       # [w, C*h]
        dn0 = (((0,), (0,)), ((), ()))
        TT = jax.lax.dot_general(
            E, VT, dn0, preferred_element_type=jnp.float32, precision=precision
        )  # [C*h, kblk]  (x-lerped rows, remat of fwd stage 1)
        TpT = jax.lax.dot_general(
            E, VpT, dn0, preferred_element_type=jnp.float32, precision=precision
        )  # [C*h, kblk]  d/dx rows

        y0c = jnp.clip(y0, 0, h - 1)
        y1c = jnp.clip(y0 + 1, 0, h - 1)
        yi = jax.lax.broadcasted_iota(jnp.int32, (h, P, nblk), 0)
        oh_y0 = yi == y0c
        oh_y1 = yi == y1c
        # y-lerp (no attention weight), its y-derivative, and the
        # attention-weighted variant used for img_grad
        Wy2 = (
            jnp.where(oh_y0, (1.0 - dy) * my0, 0.0)
            + jnp.where(oh_y1, dy * my1, 0.0)
        )
        Wyp2 = jnp.where(oh_y1, my1, 0.0) - jnp.where(oh_y0, my0, 0.0)
        Wyw2 = Wy2 * wt
        WyT = jnp.tile(Wy2.reshape(h, kblk), (C, 1))     # [C*h, kblk]
        WypT = jnp.tile(Wyp2.reshape(h, kblk), (C, 1))
        WywT = jnp.tile(Wyw2.reshape(h, kblk), (C, 1))

        # row reducer R[(c, y), c'] = (c == c')
        rowi = jax.lax.broadcasted_iota(jnp.int32, (h * C, C), 0)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (h * C, C), 1)
        R = (rowi // h == cidx).astype(jnp.float32)

        def row_reduce(ZT):
            return jax.lax.dot_general(
                R, ZT, dn0, preferred_element_type=jnp.float32,
                precision=precision,
            )  # [C, kblk]

        samplesT = row_reduce(TT * WyT)   # remat of fwd samples (unweighted)
        d_dyT = row_reduce(TT * WypT)     # d(sample)/dy_pix
        d_dxT = row_reduce(TpT * WyT)     # d(sample)/dx_pix

        # attention-weights grad: <og, samples>_C  -> [P, nblk]
        wg_ref[0, 0, lvl] = jnp.sum(
            (samplesT * og_kT).reshape(C, P, nblk), axis=0
        )

        # sampling-point grads (coordinate scale from unnormalization,
        # kernels.py:509-515 — the scale is the *level* extent, not the
        # row band's); the attention weight multiplies in (kernels.py:518-524)
        if align_corners:
            xsc, ysc = float(w - 1), float(level_h - 1)
        else:
            xsc, ysc = float(w), float(level_h)
        wt2 = wt[0]  # [P, nblk]
        gx_ref[0, 0, lvl] = xsc * wt2 * jnp.sum(
            (d_dxT * og_kT).reshape(C, P, nblk), axis=0
        )
        gy_ref[0, 0, lvl] = ysc * wt2 * jnp.sum(
            (d_dyT * og_kT).reshape(C, P, nblk), axis=0
        )

        # img grad: V @ G^T with G = Wyw * og_lane, accumulated across the
        # sequential query-block grid steps (the atomics-free scatter-add)
        og_laneT = jax.lax.dot_general(
            R, og_kT,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [C*h, kblk]: og value broadcast over the y rows of its channel
        G = WywT * og_laneT
        ig_block = jax.lax.dot_general(
            VT, G,
            (((1,), (1,)), ((), ())),   # contract kblk -> [w, C*h]
            preferred_element_type=jnp.float32,
            precision=precision,
        )

        @pl.when(nb == 0)
        def _():
            ig_refs[lvl][0, 0, :, :] = ig_block

        @pl.when(nb != 0)
        def _():
            ig_refs[lvl][0, 0, :, :] = ig_refs[lvl][0, 0, :, :] + ig_block


# y-extent cap per band for the backward (rows); the backward holds more
# concurrent [band*C, kblk] buffers than the forward, so it uses smaller
# bands to stay within VMEM (22.8 MB > 16 MB without splitting, measured).
BWD_ROW_CHUNK = 16


@functools.partial(
    jax.jit,
    static_argnames=(
        "padding_mode", "align_corners", "shapes_tuple", "precision",
    ),
)
def _pallas_bwd(
    img, sampling_points, attention_weights, out_grad,
    *, shapes_tuple, padding_mode, align_corners, precision,
):
    B, I, H, C = img.shape  # noqa: E741
    _, N, _, L, P, _ = sampling_points.shape
    shapes = np.asarray(shapes_tuple, np.int64)
    sublevels = make_sublevels(shapes, BWD_ROW_CHUNK)
    S = len(sublevels)

    x0, y0, dx, dy, bm = _prepare_raw_geometry(
        sampling_points, shapes, align_corners, sublevels
    )
    wt_l = attention_weights.astype(jnp.float32).transpose(0, 2, 3, 4, 1)
    wt = jnp.stack([wt_l[:, :, sub[0]] for sub in sublevels], axis=2)
    og = out_grad.astype(jnp.float32).transpose(0, 2, 3, 1)  # [B, H, C, N]

    n_pad = _round_up(N, N_BLOCK)
    if n_pad != N:
        pad5 = [(0, 0)] * 4 + [(0, n_pad - N)]
        x0 = jnp.pad(x0, pad5)
        y0 = jnp.pad(y0, pad5)
        dx = jnp.pad(dx, pad5)
        dy = jnp.pad(dy, pad5)
        wt = jnp.pad(wt, pad5)
        bm = jnp.pad(bm, pad5)
        og = jnp.pad(og, [(0, 0), (0, 0), (0, 0), (0, n_pad - N)])

    emats = _level_mats(img.astype(jnp.float32), shapes, sublevels)
    grid = (B * H, n_pad // N_BLOCK)

    def pt_spec():
        return pl.BlockSpec(
            (1, 1, S, P, N_BLOCK),
            lambda bh, nb: (bh // H, bh % H, 0, 0, nb),
            memory_space=pltpu.VMEM,
        )

    def og_spec():
        return pl.BlockSpec(
            (1, 1, C, N_BLOCK),
            lambda bh, nb: (bh // H, bh % H, 0, nb),
            memory_space=pltpu.VMEM,
        )

    def emat_spec(sub):
        _, _, band_h, w, _ = sublevels[sub]
        return pl.BlockSpec(
            (1, 1, w, band_h * C),
            lambda bh, nb: (bh // H, bh % H, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out_shapes = (
        [jax.ShapeDtypeStruct((B, H, S, P, n_pad), jnp.float32)] * 3
        + [
            jax.ShapeDtypeStruct(
                (B, H, sub[3], sub[2] * C), jnp.float32
            )
            for sub in sublevels
        ]
    )
    out_specs = [pt_spec() for _ in range(3)] + [emat_spec(s_) for s_ in range(S)]

    kernel = functools.partial(
        _bwd_kernel,
        level_shapes=tuple((sub[2], sub[3], sub[4]) for sub in sublevels),
        P=P,
        C=C,
        precision=precision,
        padding_mode=padding_mode,
        align_corners=bool(align_corners),
    )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pt_spec() for _ in range(6)] + [og_spec()]
        + [emat_spec(s_) for s_ in range(S)],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_pf.INTERPRET,
    )(x0, y0, dx, dy, wt, bm, og, *emats)

    wg_s, gx_s, gy_s = outs[0], outs[1], outs[2]
    ig_subs = outs[3:]

    # fold sub-levels back to levels (each point contributed in exactly one
    # band, so summing bands of the same level recovers the level grad)
    def fold(t):  # [B, H, S, P, n_pad] -> [B, N, H, L, P]
        per_level = []
        for lvl in range(L):
            idxs = [i for i, sub in enumerate(sublevels) if sub[0] == lvl]
            acc = t[:, :, idxs[0]]
            for i in idxs[1:]:
                acc = acc + t[:, :, i]
            per_level.append(acc)
        lt = jnp.stack(per_level, axis=2)  # [B, H, L, P, n_pad]
        return lt[..., :N].transpose(0, 4, 1, 2, 3)

    wg = fold(wg_s)
    pts_grad = jnp.stack([fold(gx_s), fold(gy_s)], axis=-1)

    # assemble img grad [B, I, H, C] from per-band [B, H, w, C*hs]
    # (c-major lanes); overlapping band rows add
    parts = []
    for lvl in range(L):
        h, w = int(shapes[lvl, 0]), int(shapes[lvl, 1])
        acc = jnp.zeros((B, H, w, C, h), jnp.float32)
        for i, sub in enumerate(sublevels):
            if sub[0] != lvl:
                continue
            _, off, band_h, _, _ = sub
            g = ig_subs[i].reshape(B, H, w, C, band_h)
            acc = jax.lax.dynamic_update_slice(
                acc,
                jax.lax.dynamic_slice(
                    acc, (0, 0, 0, 0, off), (B, H, w, C, band_h)
                )
                + g,
                (0, 0, 0, 0, off),
            )
        parts.append(acc.transpose(0, 4, 2, 1, 3).reshape(B, h * w, H, C))
    img_grad = jnp.concatenate(parts, axis=1)

    return (
        img_grad.astype(img.dtype),
        pts_grad.astype(sampling_points.dtype),
        wg.astype(attention_weights.dtype),
    )


def pallas_msda_bwd(
    img, img_shapes, sampling_points, attention_weights, out_grad,
    padding_mode: str = "border", align_corners: bool = False,
    precision=None,
):
    """Pallas TPU backward: returns (img_grad, sampling_points_grad,
    attention_weights_grad) — the reference backward triple (kernels.py:592)."""
    shapes = np.asarray(jax.device_get(img_shapes)).astype(np.int64)
    shapes_tuple = tuple((int(h), int(w)) for h, w in shapes)
    if precision is None:
        precision = (
            jax.lax.Precision.DEFAULT
            if img.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST
        )
    return _pallas_bwd(
        img, sampling_points, attention_weights, out_grad,
        shapes_tuple=shapes_tuple,
        padding_mode=padding_mode,
        align_corners=bool(align_corners),
        precision=precision,
    )
