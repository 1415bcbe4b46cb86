"""Pallas TPU forward kernel for multiscale deformable attention.

Design rationale (TPU-first; measured on this v5e — none of this mirrors the
reference Triton kernel, whose per-lane random loads at
/root/reference/src/msda_triton/kernels.py:207-210 have no TPU equivalent)
------------------------------------------------------------------------

MSDA forward is ``out[q, c] = sum_{l,p} w * bilerp(img_l, pt)``.  On TPU the
only fast data-dependent primitive is the MXU, so the whole op is recast as

    out[q, :] = A[:, q]^T @ E            (one contraction per query block)

where ``E = img[b, :, h, :]`` is the full flattened pyramid slice
``[I, C]`` resident in VMEM, and ``A[i, q]`` is the *folded interpolation
matrix*: for each query q, its L*P sampling points contribute their four
bilinear corner coefficients (attention weight folded in) at their flat
pyramid rows.  This folds the level loop, the point loop, the 4-corner lerp
and the attention-weighted sum into a single MXU contraction with K = I —
the one matmul shape this chip runs efficiently (small-K formulations such
as per-level separable stages measure 5-20x worse per flop here).

A is built on the VPU without any gather/scatter: per (level, point) the
2-sparse row factors are materialized by iota comparison along the *small*
axes (h and w), then combined into the [h*w, 128] level slice with a
sublane ``repeat`` (y-major) times a ``tile`` (x-minor) — an outer product
of 2-sparse vectors, i.e. exactly the 4 bilinear corners.  Border clamping
and zeros-mode masking are computed in-kernel from the raw coordinates
(``point_geometry`` — a handful of [P, nblk]-sized VPU ops per block),
matching grid_sample semantics (reference kernels.py:120-252); only the
raw (x, y, weight) arrays ever touch HBM.

Precision: the MXU is bf16-native.  f32 inputs use exact two-way bf16
splits of both operands, contracted as ONE stacked dot whose output column
blocks sum to the complete (A1+A2)@(E1+E2) product — ~2^-17 relative error,
inside the reference fp32 test tolerance (rtol=1e-4/atol=1e-3,
test_msda.py:15-27) and at the ~1e-5 parity bar.  ``precision="highest"``
uses three-way splits (f32-complete); bf16 inputs use a single pass.  See
``build_e_wide`` / ``split_bf16`` for the mechanics and the two compiler
traps (XLA excess-precision folding; scratch store forwarding) that force
this exact formulation.

Grid: ``(B*H, N_blocks)`` — each (batch, head) keeps its pyramid slice in
VMEM across the inner query-block axis; query blocks stream.  The TPU
analogue of the reference's ``[N, B, H]`` launch grid (kernels.py:365)
with a real query-block dimension (the reference's TODO, kernels.py:22-23).

All in-kernel constants are explicitly dtyped (int32/float32) so tracing is
independent of the global ``jax_enable_x64`` flag.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pallas_multiscale_deformable_attention",
    "prepare_inputs",
    "level_layout",
    "build_e_matrix",
]

# queries per grid step (lane width).
N_BLOCK = 1024

# Module default for interpreter mode; entry points take an explicit
# ``interpret=`` argument (tests pass it instead of mutating this).
INTERPRET = False

_I32 = jnp.int32
_F32 = jnp.float32


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def level_layout(shapes):
    """Row layout of the pyramid inside the E matrix.

    Each level is stored with a *padded row pitch* ``w8 = round_up(w, 8)``:
    pixel (y, x) of level l lives at row ``offsets[l] + y*w8 + x``; columns
    ``x >= w`` are zero.  The sublane-aligned pitch makes every in-kernel
    ``[h*w8] -> [h, w8]`` reshape layout-compatible (free), which the
    backward's segmented row reductions rely on.

    Returns (offsets [L], pitches [L], padded total rows); the total is
    128-aligned for clean MXU K-tiles.
    """
    offs, pitches = [], []
    off = 0
    for h, w in shapes:
        w8 = _round_up(int(w), 8)
        offs.append(off)
        pitches.append(w8)
        off += int(h) * w8
    return offs, pitches, _round_up(max(off, 128), 128)


def build_e_matrix(img, shapes):
    """img [B, I, H, C] -> E [B, H, I_pad, C] f32, levels at padded pitch.

    The value matrix for the kernel's contraction; rows outside any level
    (pitch padding, inter-level gaps, tail) are zero so garbage in the
    matching A rows cannot contribute.
    """
    B, I, H, C = img.shape  # noqa: E741
    offs, pitches, ipad = level_layout(shapes)
    imgT = img.astype(_F32).transpose(0, 2, 1, 3)  # [B, H, I, C]
    parts = []
    start = 0
    for li, (h, w) in enumerate(shapes):
        h, w = int(h), int(w)
        w8 = pitches[li]
        lvl = jax.lax.slice_in_dim(imgT, start, start + h * w, axis=2)
        if w8 != w:
            lvl = lvl.reshape(B, H, h, w, C)
            lvl = jnp.pad(lvl, [(0, 0), (0, 0), (0, 0), (0, w8 - w), (0, 0)])
            lvl = lvl.reshape(B, H, h * w8, C)
        parts.append(lvl)
        start += h * w
    e = jnp.concatenate(parts, axis=2)
    tail = ipad - e.shape[2]
    if tail:
        e = jnp.pad(e, [(0, 0), (0, 0), (0, tail), (0, 0)])
    return e


def prepare_inputs(sampling_points, attention_weights):
    """Transpose the raw per-point inputs to the kernel's query-last layout.

    Returns (x, y, wt), each [B, H, L, P, N] f32.  All geometry arithmetic
    (unnormalize, floor, clamp, masks, lerp weights) happens *inside* the
    kernels from these three arrays: it is a handful of [P, nblk]-sized VPU
    ops per block, and keeping it in-kernel avoids materializing 8-13
    geometry tensors of the full [B, H, L, P, N] size in HBM (which
    dominated both the op's memory footprint and its input bandwidth).
    """
    pts = sampling_points.astype(_F32)
    wts = attention_weights.astype(_F32)

    def tokl(t):
        return t.transpose(0, 2, 3, 4, 1)  # [B,N,H,L,P] -> [B,H,L,P,N]

    return tokl(pts[..., 0]), tokl(pts[..., 1]), tokl(wts)


def point_geometry(x, y, h, w, padding_mode, align_corners):
    """grid_sample geometry for one (level, point) slice, in-kernel.

    x, y: [1, nblk] f32 normalized coords.  h, w: static ints.  Returns
    (x0c, x1c, y0c, y1c int32 clamped corners; vx0, vx1, uy0, uy1 f32
    masked lerp factors WITHOUT the attention weight; mx0, mx1, my0, my1
    masks).  Mirrors the reference unnormalize/mask/clamp semantics
    (kernels.py:141-169); all constants explicitly dtyped.
    """
    hf = np.float32(h)
    wf = np.float32(w)
    if align_corners:
        xp = x * (wf - np.float32(1))
        yp = y * (hf - np.float32(1))
    else:
        xp = x * wf - np.float32(0.5)
        yp = y * hf - np.float32(0.5)
    x0f = jnp.floor(xp)
    y0f = jnp.floor(yp)
    dx = xp - x0f
    dy = yp - y0f
    x0 = x0f.astype(_I32)
    y0 = y0f.astype(_I32)

    one = np.float32(1)
    if padding_mode == "zeros":
        wi = np.int32(w)
        hi = np.int32(h)
        mx0 = ((x0 >= 0) & (x0 < wi)).astype(_F32)
        mx1 = ((x0 + 1 >= 0) & (x0 + 1 < wi)).astype(_F32)
        my0 = ((y0 >= 0) & (y0 < hi)).astype(_F32)
        my1 = ((y0 + 1 >= 0) & (y0 + 1 < hi)).astype(_F32)
    else:
        shp = x.shape
        mx0 = mx1 = my0 = my1 = jnp.full(shp, one, _F32)

    vx0 = (one - dx) * mx0
    vx1 = dx * mx1
    uy0 = (one - dy) * my0
    uy1 = dy * my1

    zero = np.int32(0)
    x0c = jnp.clip(x0, zero, np.int32(w - 1))
    x1c = jnp.clip(x0 + np.int32(1), zero, np.int32(w - 1))
    y0c = jnp.clip(y0, zero, np.int32(h - 1))
    y1c = jnp.clip(y0 + np.int32(1), zero, np.int32(h - 1))
    return x0c, x1c, y0c, y1c, vx0, vx1, uy0, uy1, mx0, mx1, my0, my1


def _pad_queries(geom, n, n_pad):
    """Pad the query axis; padded queries carry zero attention weights, so
    their A columns are zero and their outputs are discarded."""
    if n_pad == n:
        return geom
    pad = [(0, 0)] * 4 + [(0, n_pad - n)]
    return tuple(jnp.pad(t, pad) for t in geom)


def make_sparse_factor(idx0, idx1, v0, v1, extent, pitch, nblk):
    """2-sparse [pitch, nblk] factor: v0 at row idx0, v1 at row idx1.

    ``idx0``/``idx1`` are clamped to [0, extent), so pitch-padding rows
    (>= extent) are never selected and stay zero.
    """
    ii = jax.lax.broadcasted_iota(_I32, (pitch, nblk), 0)
    return jnp.where(ii == idx0[None], v0[None], 0.0) + jnp.where(
        ii == idx1[None], v1[None], 0.0
    )


def build_a_block(
    x, y, wt, *, level_dims, pitches, nblk, padding_mode, align_corners,
):
    """Build the folded interpolation matrix for one query block.

    ``x, y, wt`` are [L, P, nblk] slices (one (b, h) pair, one query
    block) of raw normalized coordinates and attention weights; geometry
    is computed in place (see ``point_geometry``).  Returns a list of
    per-level [h*w8, nblk] f32 blocks (w8 = padded pitch, see
    ``level_layout``): A_l[(y*w8 + x), q] = sum_p wy(y) * vx(x), the
    4-corner bilinear coefficients of every point of q at this level,
    attention weights folded in.  Shared by the forward and backward
    kernels (the backward re-materializes A instead of saving it — the
    reference's memory-parity design, kernels.py:421).
    """
    out = []
    P = x.shape[1]
    for li, (h, w) in enumerate(level_dims):
        w8 = pitches[li]
        acc = None
        for p in range(P):
            (x0c, x1c, y0c, y1c, vx0, vx1, uy0, uy1,
             _, _, _, _) = point_geometry(
                x[li, p][None], y[li, p][None], h, w,
                padding_mode, align_corners,
            )
            wtp = wt[li, p][None]
            wy = make_sparse_factor(
                y0c[0], y1c[0], (uy0 * wtp)[0], (uy1 * wtp)[0], h, h, nblk
            )  # [h, nblk]
            vx = make_sparse_factor(
                x0c[0], x1c[0], vx0[0], vx1[0], w, w8, nblk
            )  # [w8, nblk]
            # outer product of the 2-sparse factors via broadcasting in
            # [h, w8, nblk] (w8 is sublane-aligned so the final reshape to
            # row = y*w8 + x is layout-free); cheaper than materializing
            # repeat(wy) and tile(vx) separately
            term = wy[:, None, :] * vx[None, :, :]
            acc = term if acc is None else acc + term
        out.append(acc.reshape(h * w8, nblk))
    return out


def split_bf16(x, n_split):
    """Exact n-way bf16 decomposition of f32 ``x`` (x = sum of parts).

    2 parts capture ~16 mantissa bits (~2^-17 relative residual), 3 parts
    are f32-complete.  Both operands of every MXU contraction are split
    this way: the MXU is bf16-native, and contracting the parts with f32
    accumulation reproduces the f32 product (the bf16x_k emulation
    scheme).  In-kernel use only — see ``split_bf16_xla``.
    """
    parts = []
    r = x
    for _ in range(n_split - 1):
        hi = r.astype(jnp.bfloat16)
        parts.append(hi)
        r = r - hi.astype(_F32)
    parts.append(r.astype(jnp.bfloat16))
    return parts


def split_bf16_xla(x, n_split):
    """``split_bf16`` for use *outside* Pallas kernels.

    XLA's excess-precision simplification folds f32(bf16(x)) back to x,
    which would make every residual part identically zero; a barrier
    after each rounding blocks that rewrite.  (Mosaic does not apply the
    rewrite, so in-kernel splits need no barrier — and
    optimization_barrier has no Mosaic lowering anyway.)
    """
    parts = []
    r = x
    for _ in range(n_split - 1):
        hi = jax.lax.optimization_barrier(r.astype(jnp.bfloat16))
        parts.append(hi)
        r = r - hi.astype(_F32)
    parts.append(r.astype(jnp.bfloat16))
    return parts


def build_e_wide(img, shapes, n_split):
    """[B, H, n_split*ipad, n_split*C] value operand for the forward dot.

    The A operand is stacked along K as its n_split bf16 parts
    (A_1; ...; A_n).  E_wide column-stacks the E parts [E_1 | ... | E_n]
    and row-replicates that n_split times so the K extents match: the
    MXU's f32 K-accumulation then yields output column block k
    = (sum_s A_s) @ E_k, and summing the column blocks gives every cross
    term A_s @ E_k — the complete split product — from a single dot of
    n_split * K_tiles passes (vs n^2 or 2n-1 for term-paired K slabs).
    Column stacking also lifts MXU lane utilization from C=32/128 to
    n_split*C/128.
    """
    e = build_e_matrix(img, shapes)
    if n_split == 1:
        return e.astype(jnp.bfloat16)
    ecols = jnp.concatenate(split_bf16_xla(e, n_split), axis=3)
    return jnp.concatenate([ecols] * n_split, axis=2)


def assemble_a_parts(blocks, *, ipad, nblk, n_split, exact):
    """Stack per-level A blocks into the K-stacked contraction operand.

    Returns the f32 stack (exact mode) or the [n_split*ipad, nblk] bf16
    part-stack.  Built as pure SSA values: routing the split through VMEM
    scratch lets the compiler forward the pre-rounding f32 stores into the
    consuming dot and collapse the split terms, silently degrading the
    result to single-bf16 accuracy (observed on this toolchain: the slab
    contents in scratch were bit-exact, only the fused dot was wrong).
    """
    tail = ipad - sum(b.shape[0] for b in blocks)
    if exact:
        parts = list(blocks)
        if tail:
            parts.append(jnp.zeros((tail, nblk), _F32))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    per_block = [split_bf16(blk, n_split) for blk in blocks]
    rows = []
    ztail = jnp.zeros((tail, nblk), jnp.bfloat16) if tail else None
    for k in range(n_split):
        rows.extend(pb[k] for pb in per_block)
        if tail:
            rows.append(ztail)
    return jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]


def _fwd_kernel(
    # refs: x, y, wt [1,1,L,P,nblk]; e_wide [1,1,n_split*ipad,n_split*C]
    x_ref, y_ref, wt_ref,
    ewide_ref,
    out_ref,
    *, level_dims, level_offs, pitches, ipad, C, nblk, n_split, exact,
    padding_mode, align_corners,
):
    """One grid step: one (b, h) pyramid slice x one block of queries."""
    blocks = build_a_block(
        x_ref[0, 0], y_ref[0, 0], wt_ref[0, 0],
        level_dims=level_dims, pitches=pitches, nblk=nblk,
        padding_mode=padding_mode, align_corners=align_corners,
    )
    dn = (((0,), (0,)), ((), ()))
    if exact:
        # exact path (interpreter / debugging): f32 A, one highest dot
        a_cat = assemble_a_parts(
            blocks, ipad=ipad, nblk=nblk, n_split=n_split, exact=True
        )
        out_ref[0, 0] = jax.lax.dot_general(
            a_cat, ewide_ref[0, 0], dn,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=_F32,
        )
        return
    # One dot per level, accumulated: level l's dot only needs level l's
    # A block, so the MXU can overlap level l's contraction with the VPU
    # building level l+1 (a single whole-pyramid dot would serialize the
    # entire build before the first MXU pass).  E rows outside the levels
    # are zero and are never touched here.
    o = None
    ew = ewide_ref[0, 0]
    for li, blk in enumerate(blocks):
        off = level_offs[li]
        rows = blk.shape[0]
        parts = split_bf16(blk, n_split)
        a_l = (
            parts[0] if n_split == 1
            else jnp.concatenate(parts, axis=0)
        )  # [n_split*rows, nblk]
        e_l = (
            ew[off:off + rows, :] if n_split == 1
            else jnp.concatenate(
                [ew[k * ipad + off:k * ipad + off + rows, :]
                 for k in range(n_split)],
                axis=0,
            )
        )  # [n_split*rows, n_split*C]
        d = jax.lax.dot_general(a_l, e_l, dn, preferred_element_type=_F32)
        o = d if o is None else o + d
    if n_split > 1:
        acc = o[:, :C]
        for k in range(1, n_split):
            acc = acc + o[:, k * C:(k + 1) * C]
        o = acc
    out_ref[0, 0] = o


@functools.partial(
    jax.jit,
    static_argnames=(
        "shapes_tuple", "padding_mode", "align_corners", "n_split", "interpret",
    ),
)
def _pallas_fwd(
    img, sampling_points, attention_weights,
    *, shapes_tuple, padding_mode, align_corners, n_split, interpret,
):
    B, I, H, C = img.shape  # noqa: E741
    _, N, _, L, P, _ = sampling_points.shape
    shapes = np.asarray(shapes_tuple, np.int64)
    level_offs, pitches, ipad = level_layout(shapes)
    level_dims = tuple((int(h), int(w)) for h, w in shapes)

    geom = prepare_inputs(sampling_points, attention_weights)
    n_pad = _round_up(N, N_BLOCK)
    geom = _pad_queries(geom, N, n_pad)

    exact = bool(interpret)
    if exact:
        # exact f32 path: interpreter bf16 emulation drops the residual
        # split parts, and interpret mode has no perf constraints
        e_wide = build_e_matrix(img, shapes)
        kdim, ndim = ipad, C
    else:
        e_wide = build_e_wide(img, shapes, n_split)
        kdim, ndim = n_split * ipad, n_split * C

    grid = (B * H, n_pad // N_BLOCK)

    def pt_spec():
        return pl.BlockSpec(
            (1, 1, L, P, N_BLOCK),
            lambda bh, nb: (bh // H, bh % H, 0, 0, nb),
            memory_space=pltpu.VMEM,
        )

    def e_spec():
        return pl.BlockSpec(
            (1, 1, kdim, ndim),
            lambda bh, nb: (bh // H, bh % H, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out_spec = pl.BlockSpec(
        (1, 1, N_BLOCK, C),
        lambda bh, nb: (bh // H, bh % H, nb, 0),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(
        _fwd_kernel,
        level_dims=level_dims,
        level_offs=tuple(level_offs),
        pitches=tuple(pitches),
        ipad=ipad,
        C=C,
        nblk=N_BLOCK,
        n_split=n_split,
        exact=exact,
        padding_mode=padding_mode,
        align_corners=bool(align_corners),
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pt_spec() for _ in range(3)] + [e_spec()],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, n_pad, C), _F32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*geom, e_wide)

    out = out[:, :, :N].transpose(0, 2, 1, 3)  # [B, N, H, C]
    return out.astype(img.dtype)


def resolve_n_split(dtype, precision) -> int:
    """bf16 split depth for the MXU contractions.

    bf16/f16 inputs: 1 (the inputs already quantize harder than the MXU).
    f32 default: 2-way splits of both operands with all four cross terms
    (~2^-17 relative — inside the reference fp32 test tolerances
    rtol=1e-4/atol=1e-3, test_msda.py:15-27, and at the ~1e-5 parity bar).
    f32 highest: 3-way splits, f32-complete.
    """
    if dtype in (jnp.bfloat16, jnp.float16):
        return 1
    if precision in (jax.lax.Precision.HIGHEST, "highest"):
        return 3
    return 2


def pallas_multiscale_deformable_attention(
    img, img_shapes, sampling_points, attention_weights,
    padding_mode: str = "border", align_corners: bool = False,
    precision=None, interpret: bool | None = None,
):
    """Pallas TPU forward.  Requires concrete (non-traced) ``img_shapes``.

    Args/semantics identical to
    :func:`msda_tpu.ops.multiscale_deformable_attention`.
    ``interpret`` runs the kernel through the Pallas interpreter (any
    backend); defaults to the module-level ``INTERPRET`` flag.
    """
    shapes = np.asarray(jax.device_get(img_shapes)).astype(np.int64)
    shapes_tuple = tuple((int(h), int(w)) for h, w in shapes)
    if interpret is None:
        interpret = INTERPRET
    # Trace with x64 locally disabled: every kernel input/output is an
    # explicit f32/int32, but under jax_enable_x64 stray Python-int scalars
    # become 64-bit inside the kernel trace and Mosaic's dtype-conversion
    # helper recurses forever on 64-bit casts (observed: RecursionError
    # during lowering).  Disabling x64 for the trace changes no semantics.
    with jax.enable_x64(False):
        return _pallas_fwd(
            img, sampling_points, attention_weights,
            shapes_tuple=shapes_tuple,
            padding_mode=padding_mode,
            align_corners=bool(align_corners),
            n_split=resolve_n_split(img.dtype, precision),
            interpret=bool(interpret),
        )
