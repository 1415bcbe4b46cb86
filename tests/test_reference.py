"""Interpreter (pure-jnp reference path) vs torch grid_sample oracle.

Mirrors the reference forward test matrix
(/root/reference/tests/test_msda.py:65-118) — dtype x padding_mode x
align_corners — and closes its OOB-coverage gap (test_msda.py:92-100 reused
in-range points; here the OOB variant draws points in [-0.5, 1.5]).
"""

from itertools import product

import jax
import numpy as np
import pytest

from msda_tpu.ops import native_multiscale_deformable_attention
from oracle import torch_msda_oracle, torch_msda_oracle_grads
from utils import get_functional_data

# (atol, rtol) per dtype, analogous to the reference tolerance table
# (test_msda.py:15-27).
FWD_TOL = {
    "float32": (1e-5, 1e-5),
    "float64": (1e-12, 1e-12),
}
BWD_TOL = {
    "float32": (1e-4, 1e-4),
    "float64": (1e-10, 1e-10),
}

GRID = list(product(["float32", "float64"], ["border", "zeros"], [True, False]))


def _run_reference(img, shapes, pts, wts, padding_mode, align_corners):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        out = native_multiscale_deformable_attention(
            img, shapes, pts, wts, padding_mode, align_corners
        )
    return np.asarray(out)


@pytest.mark.parametrize("dtype,padding_mode,align_corners", GRID)
def test_reference_forward(dtype, padding_mode, align_corners):
    img, shapes, pts, wts, _ = get_functional_data(dtype=getattr(np, dtype))
    got = _run_reference(img, shapes, pts, wts, padding_mode, align_corners)
    want = torch_msda_oracle(img, shapes, pts, wts, padding_mode, align_corners)
    atol, rtol = FWD_TOL[dtype]
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)


@pytest.mark.parametrize("dtype,padding_mode,align_corners", GRID)
def test_reference_forward_oob_sampling(dtype, padding_mode, align_corners):
    """Genuinely out-of-range sampling points (fixes the reference's gap)."""
    img, shapes, pts, wts, _ = get_functional_data(
        dtype=getattr(np, dtype), oob=True
    )
    got = _run_reference(img, shapes, pts, wts, padding_mode, align_corners)
    want = torch_msda_oracle(img, shapes, pts, wts, padding_mode, align_corners)
    atol, rtol = FWD_TOL[dtype]
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)


@pytest.mark.parametrize("dtype,padding_mode,align_corners", GRID)
def test_reference_backward(dtype, padding_mode, align_corners):
    """All three input grads vs torch autograd through grid_sample
    (analogue of test_msda.py:129-151), with OOB points included."""
    np_dtype = getattr(np, dtype)
    img, shapes, pts, wts, og = get_functional_data(dtype=np_dtype, oob=True)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        def f(i, p, w):
            return native_multiscale_deformable_attention(
                i, shapes, p, w, padding_mode, align_corners
            )
        out, vjp = jax.vjp(f, img, pts, wts)
        img_g, pts_g, wts_g = vjp(og.astype(np_dtype))

    want_out, want_img_g, want_pts_g, want_wts_g = torch_msda_oracle_grads(
        img, shapes, pts, wts, og, padding_mode, align_corners
    )
    atol, rtol = BWD_TOL[dtype]
    np.testing.assert_allclose(np.asarray(out), want_out, atol=atol, rtol=rtol)
    np.testing.assert_allclose(np.asarray(img_g), want_img_g, atol=atol, rtol=rtol)
    np.testing.assert_allclose(np.asarray(wts_g), want_wts_g, atol=atol, rtol=rtol)
    np.testing.assert_allclose(np.asarray(pts_g), want_pts_g, atol=atol, rtol=rtol)


def test_reference_traced_img_shapes():
    """img_shapes may be a traced jnp array (no retrace needed per shape)."""
    import jax.numpy as jnp

    img, shapes, pts, wts, _ = get_functional_data()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        f = jax.jit(
            lambda i, s, p, w: native_multiscale_deformable_attention(
                i, s, p, w, "border", True
            )
        )
        got = np.asarray(f(img, jnp.asarray(shapes), pts, wts))
    want = torch_msda_oracle(img, shapes, pts, wts, "border", True)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("bad", ["padding", "shape", "pixels"])
def test_reference_validation_errors(bad):
    from msda_tpu.ops import multiscale_deformable_attention

    img, shapes, pts, wts, _ = get_functional_data()
    with pytest.raises(ValueError):
        if bad == "padding":
            multiscale_deformable_attention(img, shapes, pts, wts, "reflect", True)
        elif bad == "pixels":
            # flattened pyramid length disagrees with the level shapes —
            # silently sampling garbage would be the failure mode
            multiscale_deformable_attention(
                img[:, :-7], shapes, pts, wts, "border", True
            )
        else:
            multiscale_deformable_attention(
                img, shapes, pts[..., :1], wts, "border", True
            )


def test_functional_transforms_compose():
    """jax.vmap and grad-of-grad compose with the op (the torch reference's
    autograd.Function is @once_differentiable and has no batching rule —
    frontend.py:130-131; here both come from the functional design)."""
    import jax
    import jax.numpy as jnp
    from msda_tpu.ops import multiscale_deformable_attention

    rng = np.random.default_rng(5)
    shapes = np.array([(8, 8), (4, 4)], np.int32)
    V, B, H, C, L, P, N = 3, 2, 1, 4, 2, 2, 5
    img = rng.standard_normal((V, B, 80, H, C)).astype(np.float32)
    pts = rng.random((V, B, N, H, L, P, 2)).astype(np.float32)
    wts = rng.random((V, B, N, H, L, P)).astype(np.float32)

    def f(i, p, w):
        return multiscale_deformable_attention(
            i, shapes, p, w, "border", True)

    batched = jax.vmap(f)(img, pts, wts)
    looped = jnp.stack([f(img[k], pts[k], wts[k]) for k in range(V)])
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(looped), atol=1e-6, rtol=1e-6)

    # second-order: grad of a grad-based scalar w.r.t. the points.  Pinned
    # to the XLA impl: the Pallas path is first-order only (its custom_vjp
    # bwd is a Mosaic kernel with no JVP rule), matching the reference's
    # @once_differentiable contract (frontend.py:130-131); higher-order AD
    # is the XLA impls' extension.
    def f_ref(i, p, w):
        return multiscale_deformable_attention(
            i, shapes, p, w, "border", True, impl="reference")

    def inner(p):
        return f_ref(img[0], p, wts[0]).sum()

    def outer(p):
        return (jax.grad(inner)(p) ** 2).sum()

    gg = jax.grad(outer)(jnp.asarray(pts[0]))
    assert np.all(np.isfinite(np.asarray(gg)))
