"""Round-4 f32-forward experiment: cross-grid-step software pipeline.

NOT product code — the measured evidence behind docs/PERF_NOTES.md's
round-4 addendum (variant vx).  Kept runnable for reproduction:
    python docs/experiments/exp_fwd_pipeline_r4.py          # TPU, timed
    MSDA_FORCE_CPU=1 JAX_PLATFORMS=cpu \
        python docs/experiments/exp_fwd_pipeline_r4.py --tiny  # logic only
Measured 2026-08-19 on the live v5e: pipe 9.492 ms vs shipped 5.269 ms
(fwd f32 @10k queries, relerr 2.6e-5) — Mosaic's store-drain fires across
grid steps, and the explicit scratch round-trip costs ~2 extra dense
passes; see PERF_NOTES "Round-4 addendum" for the full dissection.

Hypothesis: the round-2 campaign's vp variant (cross-grid-step pipeline)
died on pl.when cross-branch pessimization (21.1 ms), and vs (within-step
ping-pong scratch) died because the drain before dot(k) waits on the
build(k+1) stores queued immediately before it (7.68 ms).  Untried shape:

  grid (bh, nblocks+1); every step does, in program order:
    1. DOT on the slab stored by the PREVIOUS grid step (scratch[par^1]),
       writing out block nb-1 (index map clamps; nb=0 writes garbage to
       block 0, overwritten at nb=1).
    2. BUILD block nb's A (f32 SSA), split to bf16 (a_h, a_l), store into
       scratch[par].
  No pl.when anywhere.  The dot's operands were stored one full grid step
  earlier, so if Mosaic's store-drain only waits for *queued* stores, the
  build of step k-1 has the whole dot(k-1) execution to retire.

Expected if overlap materializes: ~max(build+split+store, dots) per step
≈ 4.6-4.9 ms (vs shipped 5.34).  Expected if serialization persists:
~6.5-8 ms (vs's regime).  Either way this is a measurement, not a port.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from msda_tpu.ops import pallas_fwd as F
from msda_tpu.ops.reference import (
    native_multiscale_deformable_attention as
    reference_multiscale_deformable_attention,
)
from msda_tpu.utils.bench import timeit_op

_F32 = jnp.float32
_BF16 = jnp.bfloat16
_I32 = jnp.int32


def _pipe_kernel(
    x_ref, y_ref, wt_ref, ecat_ref, out_ref,
    ah_ref, al_ref,
    *, level_dims, level_offs, pitches, C, ipad, n, nblk, nblocks,
    padding_mode, align_corners,
):
    nb = pl.program_id(1)
    par = jax.lax.rem(nb, 2)

    # ---- 1. dot on the slab built last step (scratch[1 - par]) ----
    prev = 1 - par
    ew = ecat_ref[0, 0]                      # [ipad, 2C] bf16
    a_h = ah_ref[prev]                       # [ipad, nblk] bf16
    a_l = al_ref[prev]
    dn = (((0,), (0,)), ((), ()))
    d1 = jax.lax.dot_general(ew, a_h, dn, preferred_element_type=_F32)
    d2 = jax.lax.dot_general(ew[:, :C], a_l, dn, preferred_element_type=_F32)
    out_ref[0, 0] = d1[:C] + d1[C:] + d2

    # ---- 2. build this step's block (geometry block index map already
    #          clamps to the last real block at nb == nblocks) ----
    xin = x_ref[0, 0].astype(_F32)
    yin = y_ref[0, 0].astype(_F32)
    wt = wt_ref[0, 0].astype(_F32)
    if n % nblk:
        blk = jnp.minimum(nb, np.int32(nblocks - 1))
        xin, yin, wt = F.mask_tail_queries(xin, yin, wt, n, nblk, blk)
    for li, (h, w) in enumerate(level_dims):
        w8 = pitches[li]
        off = level_offs[li]
        wys, vxs = F.level_point_factors(
            xin[li], yin[li], wt[li], h, w, w8, nblk,
            padding_mode, align_corners)
        for roff, a_band in F.band_slabs(wys, vxs, h, w8, nblk,
                                         yb=F.level_yb(h, w8)):
            rows = a_band.shape[0]
            bh16, bl16 = F.split_bf16(a_band)
            r0 = off + roff
            ah_ref[par, r0:r0 + rows, :] = bh16
            al_ref[par, r0:r0 + rows, :] = bl16
    # rows past the last level are never built; uninitialized VMEM there
    # (NaN/garbage) would poison the full-slab dot even against zero E rows
    covered = level_offs[-1] + level_dims[-1][0] * pitches[-1]
    if covered < ipad:
        z = jnp.zeros((ipad - covered, nblk), _BF16)
        ah_ref[par, covered:, :] = z
        al_ref[par, covered:, :] = z


@functools.partial(
    jax.jit,
    static_argnames=("shapes_tuple", "padding_mode", "align_corners",
                     "interpret"),
)
def pipe_fwd(img, sampling_points, attention_weights,
             *, shapes_tuple, padding_mode, align_corners,
             interpret=False):
    B, I, H, C = img.shape  # noqa: E741
    _, N, _, L, P, _ = sampling_points.shape
    shapes = np.asarray(shapes_tuple, np.int64)
    level_offs, pitches, ipad = F.level_layout(shapes)
    level_dims = tuple((int(h), int(w)) for h, w in shapes)

    geom = F.prepare_inputs(sampling_points, attention_weights)
    nblk = 1024  # two full-A bf16 ping-pong slots must fit VMEM
    nblocks = F._round_up(N, nblk) // nblk

    e_cat, ndim = F.build_e_cat(img, shapes, "x3")

    grid = (B * H, nblocks + 1)

    def pt_spec():
        return pl.BlockSpec(
            (1, 1, L, P, nblk),
            lambda bh, nb: (bh // H, bh % H, 0, 0,
                            jnp.minimum(nb, nblocks - 1)),
            memory_space=pltpu.VMEM,
        )

    e_spec = pl.BlockSpec(
        (1, 1, ipad, ndim),
        lambda bh, nb: (bh // H, bh % H, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 1, C, nblk),
        lambda bh, nb: (bh // H, bh % H, 0,
                        jnp.maximum(nb - 1, 0)),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(
        _pipe_kernel,
        level_dims=level_dims,
        level_offs=tuple(level_offs),
        pitches=tuple(pitches),
        C=C, ipad=ipad, n=N, nblk=nblk, nblocks=nblocks,
        padding_mode=padding_mode,
        align_corners=bool(align_corners),
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pt_spec() for _ in range(3)] + [e_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, C, N), _F32),
        scratch_shapes=[
            pltpu.VMEM((2, ipad, nblk), _BF16),
            pltpu.VMEM((2, ipad, nblk), _BF16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*geom, e_cat)

    return out.transpose(0, 3, 1, 2).astype(img.dtype)


def main():
    tiny = "--tiny" in sys.argv
    if tiny:
        B, H, C, P, L = 2, 2, 32, 2, 2
        shapes = ((16, 16), (8, 8))
        N = 2500
    else:
        B, H, C, P, L = 4, 8, 32, 4, 4
        shapes = ((64, 64), (32, 32), (16, 16), (8, 8))
        N = 10_000
    I = sum(h * w for h, w in shapes)  # noqa: E741
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    img = jax.random.normal(k1, (B, I, H, C), _F32)
    pts = jax.random.uniform(k2, (B, N, H, L, P, 2), _F32)
    wts = jax.nn.softmax(
        jax.random.normal(k3, (B, N, H, L, P), _F32).reshape(B, N, H, -1),
        axis=-1).reshape(B, N, H, L, P)
    shp = jnp.asarray(shapes, jnp.int32)

    kw = dict(shapes_tuple=shapes, padding_mode="border",
              align_corners=True, interpret=tiny)

    # correctness first
    got = pipe_fwd(img, pts, wts, **kw)
    want = reference_multiscale_deformable_attention(
        img, shp, pts, wts, padding_mode="border", align_corners=True)
    err = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
    print(f"pipe relerr vs reference: {err:.2e}", flush=True)
    g = np.asarray(got)
    w = np.asarray(want)
    bad = np.argwhere(~np.isfinite(g))
    if bad.size:
        print(f"non-finite at {bad.shape[0]} positions; first rows:\n"
              f"{bad[:5]}", flush=True)
    d = np.abs(np.where(np.isfinite(g), g, 1e9) - w)
    nblk = 1024
    for blk in range(0, N, nblk):
        seg = d[:, blk:blk + nblk]
        print(f"  block n[{blk}:{blk+nblk}]: maxerr {seg.max():.3e} "
              f"nonfinite {np.size(seg) - np.isfinite(g[:, blk:blk+nblk]).sum()}",
              flush=True)
    # interpret mode collapses the bf16 split (XLA excess-precision fold),
    # so tiny-mode error sits at the single-bf16-pass level ~3e-3
    assert err < (1e-2 if tiny else 5e-4), "pipelined kernel is WRONG"
    if tiny:
        print("tiny interpret check OK")
        return

    shipped = functools.partial(
        F.pallas_multiscale_deformable_attention,
        padding_mode="border", align_corners=True)

    def step_pipe(carry):
        img_, pts_, wts_, acc = carry
        o = pipe_fwd(img_, pts_ + acc[0, 0, 0, 0] * 1e-20, wts_, **kw)
        return (img_, pts_, wts_, o)

    def step_ship(carry):
        img_, pts_, wts_, acc = carry
        o = shipped(img_, shp, pts_ + acc[0, 0, 0, 0] * 1e-20, wts_)
        return (img_, pts_, wts_, o)

    init = (img, pts, wts, got)
    t_pipe = timeit_op(step_pipe, init, n=150, repeats=4)
    print(f"pipe   fwd f32 @10k: {t_pipe * 1e3:.3f} ms", flush=True)
    t_ship = timeit_op(step_ship, init, n=150, repeats=4)
    print(f"shipped fwd f32 @10k: {t_ship * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
