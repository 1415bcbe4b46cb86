"""Streamed Pallas kernels for pyramids too large for VMEM residency.

The resident kernels (pallas_fwd/pallas_bwd) stage the whole per-(b, h)
pyramid slice in VMEM — the fast path for typical detection pyramids, but
a hard ceiling: a large base level (e.g. 256x256+) cannot fit, where the
reference Triton kernel streams pixels from global memory at any size
(/root/reference/src/msda_triton/kernels.py:184-210).

These kernels remove that ceiling the TPU way: one ``pallas_call`` per
pyramid level with a third *row-band* grid dimension.  The level's E
matrix is blocked over row bands (``yb`` y-rows x ``w8`` pitch), so VMEM
holds one E band + one A-slab band at a time regardless of level size;
the pallas block machinery streams bands HBM->VMEM double-buffered.

forward   grid (B*H, n_blocks, n_bands), bands innermost:
    out[bh, :, nb] accumulates across the sequential band axis in VMEM
    (`@pl.when(rb == 0)` init) and flushes once per query block.
backward  two pallas calls per level, because its two accumulations run
    along *different* grid axes and the VMEM out-ref accumulator pattern
    is only sound over the innermost (consecutively-revisited) axis:
      * per-point grads (wg/gx/gy) — grid (B*H, n_blocks, n_bands),
        bands innermost, accumulating in the out refs like the forward;
      * transposed img-grad — grid (B*H, n_bands, n_blocks), query
        blocks innermost, accumulating the band's [C, yb*w8] tile.
    (A single fused kernel would need one of the two reductions to cross
    a non-innermost axis via aliased-input HBM read-modify-write, whose
    correctness rests on undocumented pipelining internals — Pallas may
    elide refetches/flushes of blocks whose index did not change, which
    breaks RMW whenever n_blocks == 1.)  The only duplicated work is the
    per-point sparse-factor build, a few [yb|w8, nblk] VPU ops per point.

Both rematerialize the interpolation factors per band (the geometry
arrays are the only HBM-resident state, as in the resident kernels), so
the memory-parity property of the backward is preserved.

Selection: ``use_streaming(...)`` estimates the resident kernels' VMEM
footprint; ``ops.msda`` routes to these kernels automatically above the
budget.  Levels are processed independently (the fold decomposes as
``out = sum_l E_l^T A_l``), summed/concatenated in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fwd import (
    _round_up,
    level_layout,
    make_sparse_factor,
    point_geometry,
    split_bf16,
    split_bf16_xla,
)

__all__ = [
    "stream_fwd",
    "stream_bwd",
    "use_streaming_fwd",
    "use_streaming_bwd",
]

# queries per grid step (smaller than the resident kernels': the slab is
# the only big VMEM tenant and a narrower block keeps it modest).
# On-chip sweep (scripts/autotune.py --stream, bf16 @10k, 256-base
# pyramid, round 5): 512 and 1024 tie at BAND_ROWS_STREAM=4096 (166.5 vs
# 166.2 ms kernel fwd+bwd, within repeat noise); 512 keeps the smaller
# VMEM working set across untested geometries.
N_BLOCK_STREAM = 512

# target A-slab rows per band (yb = band_rows // w8, >= 8 rows) — chosen
# per pyramid size by _stream_band_rows below.  The round-5 on-chip sweep
# (scripts/autotune.py --stream, 256-base pyramid) found 4096 beats 2048
# at every query-block width on the BIG pyramid (180.2 -> 166.5 ms at
# width 512: taller bands amortize the per-band MXU prologue against
# unchanged slab traffic), but a forced-stream re-measure at the SMALL
# reference pyramid showed the opposite (fwd+bwd @10k f32 48.1 -> 76.9 ms
# at 4096: whole levels collapse into one band, nrb=1, and the band-level
# pipelining the kernels rely on disappears).  So: tall bands only above
# a pixel-count threshold; both branches are measured optima, the
# crossover between 5,440 and 87,040 px is bracketed, not measured.
BAND_ROWS_STREAM = 4096
BAND_ROWS_STREAM_SMALL = 2048
#: padded pixel count at/above which the tall-band constant applies
STREAM_TALL_BAND_MIN_IPAD = 32768


def _stream_band_rows(shapes_tuple) -> int:
    ipad = sum(h * _round_up(w, 8) for h, w in shapes_tuple)
    return (BAND_ROWS_STREAM if ipad >= STREAM_TALL_BAND_MIN_IPAD
            else BAND_ROWS_STREAM_SMALL)

# resident-kernel VMEM budget before switching to the streamed path;
# comfortably under the 100 MB vmem_limit with compiler headroom.
RESIDENT_VMEM_BUDGET = 72 * 1024 * 1024

_F32 = jnp.float32
_BF16 = jnp.bfloat16


def _fwd_resident_bytes(shapes, C, nblk, scheme):
    from .pallas_fwd import level_yb

    offs, pitches, ipad = level_layout(shapes)
    ebytes = {"x3": 2 * C * 2, "bf16": C * 2, "highest": C * 4}[scheme]
    # Pallas double-buffers every input window (2 buffering levels per
    # operand — measured from an OOM dump at the 256-base pyramid, where
    # the old single-copy estimate admitted a config the Mosaic allocator
    # rejected); E is the only window that scales with the pyramid.
    e = ipad * ebytes * 2
    max_rows = max(
        level_yb(int(h), int(p)) * int(p)
        for (h, _), p in zip(shapes, pitches)
    )
    # f32 slab + split halves, x3 for bands in flight: Mosaic pipelines
    # consecutive band builds, so ~2 full band slabs (plus their bf16
    # split halves under x3) are live at once — the observed 256-base
    # @nblk=2048 OOM (>100 MB actual vs 100 MB limit) back-solves to
    # about this factor on top of the double-buffered E window
    slab = max_rows * nblk * (4 + (2 if scheme == "x3" else 0)) * 3
    out = C * nblk * 4 * 2
    return e + slab + out


def use_streaming_fwd(shapes, C, scheme, nblk):
    return _fwd_resident_bytes(shapes, C, nblk, scheme) > RESIDENT_VMEM_BUDGET


def _bwd_resident_bytes(shapes, C, nblk, scheme):
    offs, pitches, ipad = level_layout(shapes)
    ebytes = {"x3": 2 * C * 2, "bf16": C * 2, "highest": C * 4}[scheme]
    g = ipad * nblk * 4          # G [ipad, nblk] f32
    ig = C * ipad * 4            # transposed img-grad accumulator
    e = ipad * ebytes
    return g + ig + e + _fwd_resident_bytes(shapes, C, nblk, scheme) // 4


def use_streaming_bwd(shapes, C, scheme, nblk):
    return _bwd_resident_bytes(shapes, C, nblk, scheme) > RESIDENT_VMEM_BUDGET


def _level_e(img, start, h, w, w8, nrb, yb, dtype):
    """One level's E matrix [B, H, nrb*yb*w8, C] at padded pitch/bands."""
    B, I, H, C = img.shape  # noqa: E741
    lvl = jax.lax.slice_in_dim(img, start, start + h * w, axis=1)
    lvl = lvl.astype(dtype).transpose(0, 2, 1, 3).reshape(B, H, h, w, C)
    pad_y = nrb * yb - h
    if w8 != w or pad_y:
        lvl = jnp.pad(
            lvl, [(0, 0), (0, 0), (0, pad_y), (0, w8 - w), (0, 0)])
    return lvl.reshape(B, H, nrb * yb * w8, C)


def _split_img(img, scheme):
    """Pre-split/cast the raw ``img`` once, before any level relayout.

    Mirrors ``build_e_cat``'s split-before-relayout: the exact bf16
    2-way split and dtype casts are elementwise, so they commute with
    the per-level transpose/zero-pad in ``_level_e`` — doing them here
    (once, on the compact [B, I, H, C] array) avoids materializing a
    padded f32 copy of every level before splitting.  Returns a tuple of
    pre-split arrays consumed by ``_level_e_cat``.
    """
    if scheme == "x3":
        return split_bf16_xla(img.astype(_F32))
    if scheme == "bf16":
        return (img.astype(_BF16),)
    return (img.astype(_F32),)


def _level_e_cat(parts, start, h, w, w8, nrb, yb, scheme, C):
    """One level's kernel E operand for ``scheme``: ([B, H, nrb*yb*w8,
    ndim], ndim), ndim = 2C for x3 (``[E_h | E_l]`` bf16) else C."""
    if scheme == "x3":
        e_h = _level_e(parts[0], start, h, w, w8, nrb, yb, _BF16)
        e_l = _level_e(parts[1], start, h, w, w8, nrb, yb, _BF16)
        return jnp.concatenate([e_h, e_l], axis=3), 2 * C
    part = parts[0]
    return _level_e(part, start, h, w, w8, nrb, yb, part.dtype), C


def _band_factors(xp, yp, wtp, y0, h, w, w8, yb, nblk,
                  padding_mode, align_corners):
    """Per-point 2-sparse factors restricted to one y band.

    ``y0`` is the (traced) first row of the band; wy is built on band-local
    row indices, so corners outside the band simply never match.
    Returns (wy [yb, nblk] with the attention weight folded, vx [w8, nblk],
    and the raw geometry tuple for gradient use).
    """
    geo = point_geometry(xp[None], yp[None], h, w, padding_mode,
                         align_corners)
    (x0c, x1c, y0c, y1c, vx0, vx1, uy0, uy1, mx0, mx1, my0, my1) = geo
    wy = make_sparse_factor(
        (y0c - y0)[0], (y1c - y0)[0], (uy0 * wtp[None])[0],
        (uy1 * wtp[None])[0], yb, yb, nblk)
    vx = make_sparse_factor(x0c[0], x1c[0], vx0[0], vx1[0], w, w8, nblk)
    return wy, vx, geo


def _stream_fwd_kernel(
    x_ref, y_ref, wt_ref, e_ref, out_ref,
    *, h, w, w8, yb, C, P, nblk, scheme, padding_mode, align_corners,
):
    rb = pl.program_id(2)
    y0 = (rb * np.int32(yb)).astype(jnp.int32)
    xin = x_ref[0, 0, 0].astype(_F32)   # [P, nblk]
    yin = y_ref[0, 0, 0].astype(_F32)
    wt = wt_ref[0, 0, 0].astype(_F32)
    ew = e_ref[0, 0]                     # [yb*w8, ndim]

    acc = None
    for p in range(P):
        wy, vx, _ = _band_factors(
            xin[p], yin[p], wt[p], y0, h, w, w8, yb, nblk,
            padding_mode, align_corners)
        term = wy[:, None, :] * vx[None, :, :]
        acc = term if acc is None else acc + term
    a_band = acc.reshape(yb * w8, nblk)

    dn = (((0,), (0,)), ((), ()))
    if scheme == "x3":
        a_h, a_l = split_bf16(a_band)
        d1 = jax.lax.dot_general(
            ew, a_h, dn, preferred_element_type=_F32)   # [2C, nblk]
        d2 = jax.lax.dot_general(
            ew[:, :C], a_l, dn, preferred_element_type=_F32)
        d = d1[:C] + d1[C:] + d2
    elif scheme == "highest":
        d = jax.lax.dot_general(
            ew, a_band, dn, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=_F32)
    else:
        d = jax.lax.dot_general(
            ew, a_band, dn, preferred_element_type=_F32)

    @pl.when(rb == 0)
    def _():
        out_ref[0, 0] = d

    @pl.when(rb != 0)
    def _():
        out_ref[0, 0] = out_ref[0, 0] + d


@functools.partial(
    jax.jit,
    static_argnames=("shapes_tuple", "padding_mode", "align_corners",
                     "scheme", "interpret"),
)
def stream_fwd(img, sampling_points, attention_weights,
               *, shapes_tuple, padding_mode, align_corners, scheme,
               interpret):
    """Streamed forward: per-level banded pallas calls, summed in XLA."""
    from .pallas_fwd import prepare_inputs, _pad_queries

    B, I, H, C = img.shape  # noqa: E741
    _, N, _, L, P, _ = sampling_points.shape
    if interpret:
        scheme = "highest"

    nblk = N_BLOCK_STREAM
    band_rows = _stream_band_rows(shapes_tuple)
    geom = prepare_inputs(sampling_points, attention_weights)
    n_pad = _round_up(N, nblk)
    geom = _pad_queries(geom, N, n_pad)
    x_all, y_all, wt_all = geom

    parts = _split_img(img, scheme)

    out = None
    start = 0
    for li, (h, w) in enumerate(shapes_tuple):
        h, w = int(h), int(w)
        w8 = _round_up(w, 8)
        yb = max(8, band_rows // w8)
        nrb = -(-h // yb)
        e_cat, ndim = _level_e_cat(parts, start, h, w, w8, nrb, yb,
                                   scheme, C)
        start += h * w

        xl = x_all[:, :, li]   # [B, H, P, n_pad]
        yl = y_all[:, :, li]
        wl = wt_all[:, :, li]

        grid = (B * H, n_pad // nblk, nrb)

        def pt_spec():
            return pl.BlockSpec(
                (1, 1, 1, P, nblk),
                lambda bh, nb, rb: (bh // H, bh % H, 0, 0, nb),
                memory_space=pltpu.VMEM)

        e_spec = pl.BlockSpec(
            (1, 1, yb * w8, ndim),
            lambda bh, nb, rb: (bh // H, bh % H, rb, 0),
            memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec(
            (1, 1, C, nblk),
            lambda bh, nb, rb: (bh // H, bh % H, 0, nb),
            memory_space=pltpu.VMEM)

        kernel = functools.partial(
            _stream_fwd_kernel,
            h=h, w=w, w8=w8, yb=yb, C=C, P=P, nblk=nblk, scheme=scheme,
            padding_mode=padding_mode, align_corners=bool(align_corners))

        o = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pt_spec() for _ in range(3)] + [e_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, H, C, n_pad), _F32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(xl[:, :, None], yl[:, :, None], wl[:, :, None], e_cat)
        out = o if out is None else out + o

    out = out[:, :, :, :N].transpose(0, 3, 1, 2)  # [B, N, H, C]
    return out.astype(img.dtype)


def _stream_bwd_pts_kernel(
    x_ref, y_ref, wt_ref, og_ref, e_ref,
    wg_ref, gx_ref, gy_ref,
    *, h, w, w8, yb, C, P, nblk, scheme, padding_mode, align_corners,
):
    """Per-point grads; grid (B*H, n_blocks, n_bands), bands innermost.

    The out blocks' indices depend only on the query block, so across the
    innermost band axis each stays VMEM-resident and accumulates with the
    documented ``@pl.when(rb == 0)`` init pattern (single ref update per
    output per grid step — per-band RMW on a ref serializes the MXU, see
    docs/PERF_NOTES.md)."""
    rb = pl.program_id(2)
    y0 = (rb * np.int32(yb)).astype(jnp.int32)
    xin = x_ref[0, 0, 0].astype(_F32)
    yin = y_ref[0, 0, 0].astype(_F32)
    wt = wt_ref[0, 0, 0].astype(_F32)
    og = og_ref[0, 0].astype(_F32)          # [nblk, C]
    ew = e_ref[0, 0]                         # [yb*w8, ndim]

    dn_g = (((1,), (1,)), ((), ()))
    if scheme == "x3":
        og_h, og_l = split_bf16(og)
        og_cat = jnp.concatenate([og_h, og_l, og_h, og_l], axis=1)
        e4 = jnp.concatenate(
            [ew[:, :C], ew[:, :C], ew[:, C:], ew[:, C:]], axis=1)
        G = jax.lax.dot_general(
            e4, og_cat, dn_g, preferred_element_type=_F32)
    elif scheme == "highest":
        G = jax.lax.dot_general(
            ew, og, dn_g, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=_F32)
    else:
        G = jax.lax.dot_general(ew, og.astype(_BF16), dn_g,
                                preferred_element_type=_F32)
    G3 = G.reshape(yb, w8, nblk)

    if align_corners:
        xsc = np.float32(w - 1)
        ysc = np.float32(h - 1)
    else:
        xsc = np.float32(w)
        ysc = np.float32(h)

    wg_rows, gx_rows, gy_rows = [], [], []
    for p in range(P):
        geo = point_geometry(xin[p][None], yin[p][None], h, w,
                             padding_mode, align_corners)
        (x0c, x1c, y0c, y1c, vx0, vx1, uy0, uy1,
         mx0, mx1, my0, my1) = geo
        vx = make_sparse_factor(x0c[0], x1c[0], vx0[0], vx1[0], w, w8, nblk)
        vxd = make_sparse_factor(
            x0c[0], x1c[0], (-mx0)[0], mx1[0], w, w8, nblk)
        wy = make_sparse_factor(
            (y0c - y0)[0], (y1c - y0)[0], uy0[0], uy1[0], yb, yb, nblk)
        wyd = make_sparse_factor(
            (y0c - y0)[0], (y1c - y0)[0], (-my0)[0], my1[0], yb, yb, nblk)
        rowy = jnp.sum(G3 * vx[None], axis=1)    # [yb, nblk]
        rowyd = jnp.sum(G3 * vxd[None], axis=1)
        wtp = wt[p]
        wg_rows.append(jnp.sum(wy * rowy, axis=0))
        gx_rows.append(xsc * wtp * jnp.sum(wy * rowyd, axis=0))
        gy_rows.append(ysc * wtp * jnp.sum(wyd * rowy, axis=0))

    wg_step = jnp.stack(wg_rows, axis=0)         # [P, nblk]
    gx_step = jnp.stack(gx_rows, axis=0)
    gy_step = jnp.stack(gy_rows, axis=0)

    @pl.when(rb == 0)
    def _():
        wg_ref[0, 0, 0] = wg_step
        gx_ref[0, 0, 0] = gx_step
        gy_ref[0, 0, 0] = gy_step

    @pl.when(rb != 0)
    def _():
        wg_ref[0, 0, 0] = wg_ref[0, 0, 0] + wg_step
        gx_ref[0, 0, 0] = gx_ref[0, 0, 0] + gx_step
        gy_ref[0, 0, 0] = gy_ref[0, 0, 0] + gy_step


def _stream_bwd_img_kernel(
    x_ref, y_ref, wt_ref, og_ref, ig_ref,
    *, h, w, w8, yb, C, P, nblk, scheme, padding_mode, align_corners,
):
    """Transposed img-grad; grid (B*H, n_bands, n_blocks), queries
    innermost — the band's [C, yb*w8] tile accumulates across query
    blocks in VMEM and flushes once per band.  Needs no E operand."""
    rb = pl.program_id(1)
    nq = pl.program_id(2)
    y0 = (rb * np.int32(yb)).astype(jnp.int32)
    xin = x_ref[0, 0, 0].astype(_F32)
    yin = y_ref[0, 0, 0].astype(_F32)
    wt = wt_ref[0, 0, 0].astype(_F32)
    og = og_ref[0, 0].astype(_F32)          # [nblk, C]

    acc = None
    for p in range(P):
        wy, vx, _ = _band_factors(
            xin[p], yin[p], wt[p], y0, h, w, w8, yb, nblk,
            padding_mode, align_corners)
        term = wy[:, None, :] * vx[None, :, :]
        acc = term if acc is None else acc + term
    a_band = acc.reshape(yb * w8, nblk)

    dn_ig = (((0,), (1,)), ((), ()))
    if scheme == "x3":
        og_h, og_l = split_bf16(og)
        a_h, a_l = split_bf16(a_band)
        og_cat2 = jnp.concatenate([og_h, og_l], axis=1)
        d1 = jax.lax.dot_general(
            og_cat2, a_h, dn_ig, preferred_element_type=_F32)
        d2 = jax.lax.dot_general(
            og_h, a_l, dn_ig, preferred_element_type=_F32)
        ig_step = d1[:C] + d1[C:] + d2
    elif scheme == "highest":
        ig_step = jax.lax.dot_general(
            og, a_band, dn_ig, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=_F32)
    else:
        ig_step = jax.lax.dot_general(
            og.astype(_BF16), a_band, dn_ig, preferred_element_type=_F32)

    @pl.when(nq == 0)
    def _():
        ig_ref[0, 0] = ig_step

    @pl.when(nq != 0)
    def _():
        ig_ref[0, 0] = ig_ref[0, 0] + ig_step


@functools.partial(
    jax.jit,
    static_argnames=("shapes_tuple", "padding_mode", "align_corners",
                     "scheme", "interpret"),
)
def stream_bwd(img, sampling_points, attention_weights, out_grad,
               *, shapes_tuple, padding_mode, align_corners, scheme,
               interpret):
    """Streamed backward: per-level banded pallas calls.

    Returns (img_grad, sampling_points_grad, attention_weights_grad)."""
    from .pallas_fwd import prepare_inputs, _pad_queries

    B, I, H, C = img.shape  # noqa: E741
    _, N, _, L, P, _ = sampling_points.shape
    if interpret:
        scheme = "highest"

    nblk = N_BLOCK_STREAM
    band_rows = _stream_band_rows(shapes_tuple)
    geom = prepare_inputs(sampling_points, attention_weights)
    n_pad = _round_up(N, nblk)
    geom = _pad_queries(geom, N, n_pad)
    x_all, y_all, wt_all = geom

    og = out_grad.astype(_F32).transpose(0, 2, 1, 3)  # [B, H, N, C]
    if n_pad != N:
        og = jnp.pad(og, [(0, 0), (0, 0), (0, n_pad - N), (0, 0)])

    parts = _split_img(img, scheme)

    wg_parts, gx_parts, gy_parts, ig_parts = [], [], [], []
    start = 0
    for li, (h, w) in enumerate(shapes_tuple):
        h, w = int(h), int(w)
        w8 = _round_up(w, 8)
        yb = max(8, band_rows // w8)
        nrb = -(-h // yb)
        e_cat, ndim = _level_e_cat(parts, start, h, w, w8, nrb, yb,
                                   scheme, C)
        start += h * w

        xl = x_all[:, :, li][:, :, None]
        yl = y_all[:, :, li][:, :, None]
        wl = wt_all[:, :, li][:, :, None]

        kargs = dict(
            h=h, w=w, w8=w8, yb=yb, C=C, P=P, nblk=nblk, scheme=scheme,
            padding_mode=padding_mode, align_corners=bool(align_corners))
        cparams = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)

        # per-point grads: grid (bh, nb, rb), bands innermost
        def pt_spec_nb():
            return pl.BlockSpec(
                (1, 1, 1, P, nblk),
                lambda bh, nb, rb: (bh // H, bh % H, 0, 0, nb),
                memory_space=pltpu.VMEM)

        og_spec_nb = pl.BlockSpec(
            (1, 1, nblk, C),
            lambda bh, nb, rb: (bh // H, bh % H, nb, 0),
            memory_space=pltpu.VMEM)
        e_spec_nb = pl.BlockSpec(
            (1, 1, yb * w8, ndim),
            lambda bh, nb, rb: (bh // H, bh % H, rb, 0),
            memory_space=pltpu.VMEM)

        wg, gx, gy = pl.pallas_call(
            functools.partial(_stream_bwd_pts_kernel, **kargs),
            grid=(B * H, n_pad // nblk, nrb),
            in_specs=[pt_spec_nb() for _ in range(3)]
            + [og_spec_nb, e_spec_nb],
            out_specs=[pt_spec_nb(), pt_spec_nb(), pt_spec_nb()],
            out_shape=[
                jax.ShapeDtypeStruct((B, H, 1, P, n_pad), _F32),
                jax.ShapeDtypeStruct((B, H, 1, P, n_pad), _F32),
                jax.ShapeDtypeStruct((B, H, 1, P, n_pad), _F32),
            ],
            compiler_params=cparams,
            interpret=interpret,
        )(xl, yl, wl, og, e_cat)

        # img grad: grid (bh, rb, nb), query blocks innermost
        def pt_spec_rb():
            return pl.BlockSpec(
                (1, 1, 1, P, nblk),
                lambda bh, rb, nb: (bh // H, bh % H, 0, 0, nb),
                memory_space=pltpu.VMEM)

        og_spec_rb = pl.BlockSpec(
            (1, 1, nblk, C),
            lambda bh, rb, nb: (bh // H, bh % H, nb, 0),
            memory_space=pltpu.VMEM)
        ig_spec = pl.BlockSpec(
            (1, 1, C, yb * w8),
            lambda bh, rb, nb: (bh // H, bh % H, 0, rb),
            memory_space=pltpu.VMEM)

        ig = pl.pallas_call(
            functools.partial(_stream_bwd_img_kernel, **kargs),
            grid=(B * H, nrb, n_pad // nblk),
            in_specs=[pt_spec_rb() for _ in range(3)] + [og_spec_rb],
            out_specs=ig_spec,
            out_shape=jax.ShapeDtypeStruct(
                (B, H, C, nrb * yb * w8), _F32),
            compiler_params=cparams,
            interpret=interpret,
        )(xl, yl, wl, og)

        wg_parts.append(wg)
        gx_parts.append(gx)
        gy_parts.append(gy)
        # un-pitch/un-band this level's img grad: [C, nrb*yb*w8] -> [h*w, C]
        g = ig.reshape(B, H, C, nrb * yb, w8)[:, :, :, :h, :w]
        ig_parts.append(g.reshape(B, H, C, h * w))

    def fold_pts(parts):  # L x [B, H, 1, P, n_pad] -> [B, N, H, L, P]
        t = jnp.concatenate(parts, axis=2)
        return t[..., :N].transpose(0, 4, 1, 2, 3)

    wg = fold_pts(wg_parts)
    pts_grad = jnp.stack(
        [fold_pts(gx_parts), fold_pts(gy_parts)], axis=-1)
    img_grad = jnp.concatenate(ig_parts, axis=3).transpose(0, 3, 1, 2)

    return (
        img_grad.astype(img.dtype),
        pts_grad.astype(sampling_points.dtype),
        wg.astype(attention_weights.dtype),
    )
