"""Public multiscale deformable attention op: dispatch + custom VJP.

This is the TPU-native analogue of the reference dispatch/autograd layer
(/root/reference/src/msda_triton/frontend.py:71-172):

* ``multiscale_deformable_attention`` — the public differentiable function.
  Mirrors the reference signature (frontend.py:145-166) with the same
  argument semantics, plus an explicit ``impl`` selector instead of the
  reference's silent try/except fallback (frontend.py:167-172).
* a ``jax.custom_vjp`` binding whose backward *rematerializes* the forward
  instead of saving bilinear samples, so peak memory matches the fallback —
  the same design property as the reference backward kernel
  (kernels.py:421 "recompute forward", README.md:20 equal-memory claim).

Implementations:
    "pallas":    Pallas TPU kernels (pallas_fwd.py / pallas_bwd.py) — the
                 fast path: bilinear sampling recast as MXU matmuls against
                 VMEM-resident level images (measured ~10-20x faster than
                 any XLA-gather formulation on TPU v5e, whose general gather
                 runs far below HBM bandwidth).
    "fused":     XLA-level per-level 2x2 patch gathers (fused.py); portable,
                 but gather-bound on TPU.
    "reference": the pure-jnp row-gather interpreter (reference.py), the
                 semantics spec; runs on any backend, supports f64 on CPU.
    "auto":      "pallas" on TPU (static shapes), "reference" elsewhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .reference import native_multiscale_deformable_attention
from . import fused as _fused
from . import pallas_fwd as _pfwd
from . import pallas_bwd as _pbwd

__all__ = ["multiscale_deformable_attention"]

_VALID_PADDING = ("border", "zeros")
_VALID_IMPL = ("auto", "pallas", "fused", "reference")

# Dtypes accepted for the differentiable op; mirrors the reference whitelist
# {fp16, fp32, fp64} (frontend.py:84-90) with bf16 added as the TPU-native
# half precision. f64 is only usable off-TPU.
_VALID_DTYPES = (jnp.bfloat16, jnp.float16, jnp.float32, jnp.float64)


def _check_inputs(img, img_shapes, sampling_points, attention_weights):
    for name, t in (
        ("img", img),
        ("sampling_points", sampling_points),
        ("attention_weights", attention_weights),
    ):
        if t.dtype not in _VALID_DTYPES:
            raise ValueError(
                f"Dtype of `{name}` should be one of "
                f"{[jnp.dtype(d).name for d in _VALID_DTYPES]}, got {t.dtype}."
            )
    if img.ndim != 4:
        raise ValueError(f"`img` must be [B, I, H, C], got shape {img.shape}")
    if sampling_points.ndim != 6 or sampling_points.shape[-1] != 2:
        raise ValueError(
            "`sampling_points` must be [B, N, H, L, P, 2], got shape "
            f"{sampling_points.shape}"
        )
    if attention_weights.shape != sampling_points.shape[:-1]:
        raise ValueError(
            "`attention_weights` must be [B, N, H, L, P] = "
            f"{sampling_points.shape[:-1]}, got {attention_weights.shape}"
        )
    B, I, H, C = img.shape  # noqa: E741
    Bp, N, Hp, L, P, _ = sampling_points.shape
    if (B, H) != (Bp, Hp):
        raise ValueError(
            f"Batch/head mismatch between img {img.shape} and "
            f"sampling_points {sampling_points.shape}"
        )
    if img_shapes.shape != (L, 2):
        raise ValueError(
            f"`img_shapes` must be [L, 2] = [{L}, 2], got {img_shapes.shape}"
        )


def _concrete_shapes_tuple(img_shapes):
    """``None`` if ``img_shapes`` is traced, else a static ``((h, w), ...)``
    tuple of ints.  Concreteness must be judged on the *raw* argument:
    ``jnp.asarray`` stages even numpy constants into tracers under an
    outer jit.  The single source of truth for dispatch concreteness —
    used by both the op entry and :func:`resolved_impl` so the module's
    mesh-path routing can never diverge from the op's own dispatch."""
    if isinstance(img_shapes, jax.core.Tracer):
        return None
    shapes_np = np.asarray(jax.device_get(img_shapes))
    if shapes_np.ndim != 2 or shapes_np.shape[-1] != 2:
        raise ValueError(
            f"`img_shapes` must be [L, 2], got shape {shapes_np.shape}"
        )
    return tuple((int(h), int(w)) for h, w in shapes_np)


def _resolve_impl(impl: str, shapes_tuple, dtype) -> str:
    if impl not in _VALID_IMPL:
        raise ValueError(f"impl must be one of {_VALID_IMPL}, got {impl!r}")
    traced_shapes = shapes_tuple is None
    f64 = dtype == jnp.float64
    if impl == "auto":
        if jax.default_backend() == "tpu" and not traced_shapes and not f64:
            return "pallas"
        return "reference"
    if impl == "pallas" and f64:
        raise ValueError(
            "impl='pallas' supports bf16/f16/f32 only; use "
            "impl='reference' for float64 (interpreter path)."
        )
    if impl == "pallas" and traced_shapes:
        # the Pallas kernels specialize on the (static) pyramid geometry
        raise ValueError(
            "impl='pallas' requires concrete img_shapes (got a traced "
            "value): pass a numpy array / static sequence, or mark "
            "img_shapes static in your jit. Use impl='auto' to fall back "
            "to the reference path for traced shapes."
        )
    return impl


def resolved_impl(impl: str, img_shapes, dtype) -> str:
    """Which implementation ``multiscale_deformable_attention`` will run.

    Public so callers that must place the op differently per backend can
    ask first — in particular the module's mesh path
    (models/attention.py): GSPMD can partition every XLA impl but not a
    ``pallas_call``, so when this returns "pallas" the op must go through
    ``parallel.shard_map_multiscale_deformable_attention`` instead of
    sharding constraints.
    """
    return _resolve_impl(impl, _concrete_shapes_tuple(img_shapes), dtype)


def _shapes_arg(shapes_tuple, img_shapes):
    """Concrete shapes travel as a static tuple; traced ones as the array."""
    if shapes_tuple is not None:
        return np.asarray(shapes_tuple, np.int32)
    return img_shapes


def _run_forward(img, img_shapes, pts, wts,
                 shapes_tuple, padding_mode, align_corners, impl,
                 precision=None):
    shapes = _shapes_arg(shapes_tuple, img_shapes)
    if impl == "pallas":
        return _pfwd.pallas_multiscale_deformable_attention(
            img, shapes, pts, wts, padding_mode, align_corners,
            precision=precision,
        )
    if impl == "fused":
        return _fused.fused_multiscale_deformable_attention(
            img, shapes, pts, wts, padding_mode, align_corners
        )
    return native_multiscale_deformable_attention(
        img, shapes, pts, wts, padding_mode, align_corners
    )


# ``shapes_tuple`` is a *static* (nondiff) argument: the pyramid geometry is
# shape-like data the kernels specialize on, and routing it through the
# residuals would turn it into a tracer inside the backward under an outer
# jit/scan/vjp, silently breaking the Pallas backward path.  When the caller
# genuinely traces img_shapes (reference impl only), shapes_tuple is None
# and the array rides along as a regular (integer, zero-cotangent) input.
@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _msda(img, img_shapes, pts, wts,
          shapes_tuple, padding_mode, align_corners, impl, precision):
    return _run_forward(
        img, img_shapes, pts, wts,
        shapes_tuple, padding_mode, align_corners, impl, precision,
    )


def _msda_fwd(img, img_shapes, pts, wts,
              shapes_tuple, padding_mode, align_corners, impl, precision):
    out = _run_forward(
        img, img_shapes, pts, wts,
        shapes_tuple, padding_mode, align_corners, impl, precision,
    )
    # Save only the primal inputs — the backward rematerializes the bilinear
    # sampling, matching the reference's memory-parity design
    # (frontend.py:121, kernels.py:421).
    return out, (img, img_shapes, pts, wts)


def _msda_bwd(shapes_tuple, padding_mode, align_corners, impl, precision,
              residuals, out_grad):
    img, img_shapes, pts, wts = residuals
    shapes = _shapes_arg(shapes_tuple, img_shapes)
    if impl == "pallas":
        img_grad, pts_grad, wts_grad = _pbwd.pallas_msda_bwd(
            img, shapes, pts, wts, out_grad, padding_mode, align_corners,
            precision=precision,
        )
    elif impl == "fused":
        img_grad, pts_grad, wts_grad = _fused.fused_msda_vjp(
            img, shapes, pts, wts, out_grad, padding_mode, align_corners
        )
    else:
        _, vjp_fn = jax.vjp(
            lambda i, p, w: native_multiscale_deformable_attention(
                i, shapes, p, w, padding_mode, align_corners
            ),
            img,
            pts,
            wts,
        )
        img_grad, pts_grad, wts_grad = vjp_fn(out_grad)
    # img_shapes is integer-valued -> float0 cotangent.
    shapes_grad = np.zeros(img_shapes.shape, dtype=jax.dtypes.float0)
    return img_grad, shapes_grad, pts_grad, wts_grad


_msda.defvjp(_msda_fwd, _msda_bwd)


def multiscale_deformable_attention(
    img,
    img_shapes,
    sampling_points,
    attention_weights,
    padding_mode: str = "border",
    align_corners: bool = False,
    *,
    impl: str = "auto",
    precision=None,
):
    """Differentiable multiscale deformable attention (Deformable DETR,
    arXiv:2010.04159).

    Args:
        img: ``[batch, num_pixels, num_heads, head_channels]`` flattened
            feature pyramid, where ``num_pixels = sum(h_l * w_l)`` over
            levels.
        img_shapes: ``[num_levels, 2]`` integer (height, width) per level.
            May be a traced jnp array, numpy array, or sequence of pairs.
        sampling_points: ``[batch, num_queries, num_heads, num_levels,
            num_points, 2]`` sampling locations in normalized (x, y)
            coordinates in [0, 1]; (0, 0) is the top-left corner and (1, 1)
            the bottom-right.
        attention_weights: ``[batch, num_queries, num_heads, num_levels,
            num_points]``.
        padding_mode: how out-of-bounds samples are handled — "border"
            clamps to the nearest edge pixel, "zeros" treats outside as 0.
        align_corners: grid alignment convention, as in
            ``torch.nn.functional.grid_sample``.
        precision: MXU contraction accuracy for the Pallas path (other
            impls compute in f32 and ignore it) — None (default): exact
            2-way bf16 operand splits, ~1e-5 relative; "highest" (or
            ``jax.lax.Precision.HIGHEST``): the MXU's native fp32
            contraction, ~3e-7 relative.  Half-precision inputs ignore
            ``precision``: bf16 *and* f16 both run a single bf16 MXU pass
            (the TPU MXU has no f16 mode, so f16 operands lose their 3
            extra mantissa bits at the contraction; measured error stays
            within the reference's own half-precision test tolerance of
            1e-1 — see tests/test_dtypes.py and
            ``pallas_fwd.resolve_scheme``).
        impl: implementation selector —
            "auto" (default): the Pallas TPU kernels on a TPU backend with
                concrete ``img_shapes``, the pure-jnp "reference" path
                otherwise;
            "pallas": the Pallas TPU kernels (raises for traced
                ``img_shapes`` — the kernels specialize on the pyramid
                geometry).  First-order differentiable only, like the
                reference's ``@once_differentiable`` autograd binding
                (frontend.py:130-131): the custom_vjp backward is itself
                a Mosaic kernel with no JVP rule, so grad-of-grad /
                ``jacfwd`` must use "reference" or "fused";
            "fused": the XLA patch-gather formulation (portable, slow on
                TPU at scale — gather-bound);
            "reference": the pure-jnp interpreter (any backend, f64-capable
                off-TPU; the semantics specification).

    Returns:
        ``[batch, num_queries, num_heads, head_channels]`` output tensor.

    Reference parity: function semantics match
    /root/reference/src/msda_triton/frontend.py:145-172 (including
    grid_sample-exact padding_mode / align_corners behavior).
    """
    if padding_mode not in _VALID_PADDING:
        raise ValueError(
            f"padding_mode must be one of {_VALID_PADDING}, got {padding_mode!r}"
        )
    shapes_tuple = _concrete_shapes_tuple(img_shapes)
    if shapes_tuple is not None:
        expected_i = sum(h * w for h, w in shapes_tuple)
        if img.shape[1] != expected_i:
            raise ValueError(
                f"`img` has {img.shape[1]} pixels but `img_shapes` "
                f"{shapes_tuple} sums to {expected_i}: the flattened "
                "pyramid and the level shapes disagree."
            )
    img_shapes = jnp.asarray(img_shapes)
    if not jnp.issubdtype(img_shapes.dtype, jnp.integer):
        img_shapes = img_shapes.astype(jnp.int32)
    _check_inputs(img, img_shapes, sampling_points, attention_weights)
    impl = _resolve_impl(impl, shapes_tuple, img.dtype)
    return _msda(
        img,
        img_shapes,
        sampling_points,
        attention_weights,
        shapes_tuple,
        padding_mode,
        bool(align_corners),
        impl,
        precision,
    )
