"""Fused (patch-gather) path vs the interpreter reference and torch oracle.

Analogue of the reference's Triton-vs-oracle tests
(/root/reference/tests/test_msda.py:65-151), with genuinely OOB sampling
points, run on whatever the default backend is (TPU when available, CPU
otherwise — the fused formulation is pure XLA and runs anywhere).
"""

from itertools import product

import jax
import numpy as np
import pytest

from msda_tpu.ops import multiscale_deformable_attention
from msda_tpu.ops import multiscale_deformable_attention as msda
from oracle import torch_msda_oracle, torch_msda_oracle_grads
from utils import get_functional_data

# bf16 tolerance follows the reference's fp16 row (test_msda.py:16-18):
# half-precision *inputs* quantize the sampling coordinates themselves, so
# errors vs the f32 oracle are O(1e-1).
FWD_TOL = {"float32": (1e-5, 1e-5), "bfloat16": (1.5e-1, 1.5e-1)}
BWD_TOL = {"float32": (1e-4, 1e-4)}

GRID = list(product(["border", "zeros"], [True, False]))


@pytest.mark.parametrize("padding_mode,align_corners", GRID)
@pytest.mark.parametrize("oob", [False, True])
def test_fused_forward(padding_mode, align_corners, oob):
    img, shapes, pts, wts, _ = get_functional_data(dtype=np.float32, oob=oob)
    got = np.asarray(
        jax.jit(
            lambda i, p, w: multiscale_deformable_attention(
                i, shapes, p, w, padding_mode, align_corners, impl="fused"
            )
        )(img, pts, wts)
    )
    want = torch_msda_oracle(img, shapes, pts, wts, padding_mode, align_corners)
    atol, rtol = FWD_TOL["float32"]
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)


@pytest.mark.slow
@pytest.mark.parametrize("padding_mode,align_corners", GRID)
def test_fused_backward(padding_mode, align_corners):
    img, shapes, pts, wts, og = get_functional_data(dtype=np.float32, oob=True)

    def f(i, p, w):
        return multiscale_deformable_attention(
            i, shapes, p, w, padding_mode, align_corners, impl="fused"
        )

    @jax.jit
    def run(i, p, w, o):
        out, vjp = jax.vjp(f, i, p, w)
        return (out, *vjp(o))

    out, img_g, pts_g, wts_g = run(img, pts, wts, og)

    want_out, want_img_g, want_pts_g, want_wts_g = torch_msda_oracle_grads(
        img, shapes, pts, wts, og, padding_mode, align_corners
    )
    atol, rtol = BWD_TOL["float32"]
    np.testing.assert_allclose(np.asarray(out), want_out, atol=atol, rtol=rtol)
    np.testing.assert_allclose(np.asarray(img_g), want_img_g, atol=atol, rtol=rtol)
    np.testing.assert_allclose(np.asarray(wts_g), want_wts_g, atol=atol, rtol=rtol)
    np.testing.assert_allclose(np.asarray(pts_g), want_pts_g, atol=atol, rtol=rtol)


def test_fused_bf16():
    """bf16 storage runs and is close to the f32 oracle at half tolerance."""
    import jax.numpy as jnp

    img, shapes, pts, wts, _ = get_functional_data(dtype=np.float32)
    got = np.asarray(
        jax.jit(
            lambda i, p, w: multiscale_deformable_attention(
                i, shapes, p, w, "border", True, impl="fused"
            ).astype(jnp.float32)
        )(
            jnp.asarray(img, jnp.bfloat16),
            jnp.asarray(pts, jnp.bfloat16),
            jnp.asarray(wts, jnp.bfloat16),
        )
    )
    want = torch_msda_oracle(img, shapes, pts, wts, "border", True)
    atol, rtol = FWD_TOL["bfloat16"]
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)


def test_fused_matches_reference_jit_grad():
    """jit(grad(fused)) == jit(grad(reference)) on the same inputs."""
    import jax.numpy as jnp

    img, shapes, pts, wts, og = get_functional_data(dtype=np.float32, oob=True)

    def make_loss(impl):
        def loss(i, p, w):
            out = multiscale_deformable_attention(
                i, shapes, p, w, "zeros", False, impl=impl
            )
            return jnp.sum(out * og)
        return loss

    g_fused = jax.jit(jax.grad(make_loss("fused"), argnums=(0, 1, 2)))(img, pts, wts)
    g_ref = jax.jit(jax.grad(make_loss("reference"), argnums=(0, 1, 2)))(img, pts, wts)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_fused_one_pixel_levels():
    """Levels with height or width 1: the fixed-size 2x2 patch gather must
    stay in bounds (regression: clip(x, 0, w-2) produced -1 with
    PROMISE_IN_BOUNDS for w == 1 — silently wrong values/grads)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    shapes = np.array([(5, 4), (1, 3), (2, 1), (1, 1)], np.int32)
    B, H, C, P, L, N = 2, 2, 8, 2, 4, 40
    I = int((shapes[:, 0] * shapes[:, 1]).sum())  # noqa: E741
    img = jnp.asarray(rng.standard_normal((B, I, H, C)), jnp.float32)
    pts = jnp.asarray(rng.random((B, N, H, L, P, 2)) * 1.4 - 0.2, jnp.float32)
    logits = rng.standard_normal((B, N, H, L, P))
    e = np.exp(logits - logits.max(axis=(-1, -2), keepdims=True))
    wts = jnp.asarray(e / e.sum(axis=(-1, -2), keepdims=True), jnp.float32)
    og = jnp.asarray(rng.standard_normal((B, N, H, C)), jnp.float32)

    for padding_mode in ("border", "zeros"):
        def f(impl):
            def g(i, p, w):
                return msda(i, shapes, p, w, padding_mode, True, impl=impl)

            # one jit per config: eager vjp chains dispatch per-op, which
            # is pathologically slow through remote TPU tunnels
            @jax.jit
            def run(i, p, w, o):
                out, vjp = jax.vjp(g, i, p, w)
                return (out, *vjp(o))

            return tuple(np.asarray(t) for t in run(img, pts, wts, og))

        got = f("fused")
        want = f("reference")
        for name, a, b in zip(("out", "ig", "pg", "wg"), got, want):
            np.testing.assert_allclose(
                a, b, atol=1e-5, rtol=1e-5,
                err_msg=f"{name} ({padding_mode}, 1px levels)",
            )
