"""Pallas kernel tests.

On TPU: compiled kernels vs the interpreter reference across the full
padding x align_corners grid with OOB points, forward and all three
gradients (the analogue of the reference's Triton-vs-oracle matrix,
/root/reference/tests/test_msda.py:65-151).

On CPU: one configuration through the Pallas interpreter, so kernel logic
is exercised by every CI run even without TPU hardware.
"""

from itertools import product

import jax
import numpy as np
import pytest

from conftest import has_tpu, requires_tpu
from msda_tpu.ops import multiscale_deformable_attention as msda
from msda_tpu.ops import pallas_fwd as _pf
from utils import get_functional_data

GRID = list(product(["border", "zeros"], [True, False]))


def _run_pair(padding_mode, align_corners):
    img, shapes, pts, wts, og = get_functional_data(oob=True)

    def f(impl):
        def g(i, p, w):
            return msda(i, shapes, p, w, padding_mode, align_corners, impl=impl)
        out, vjp = jax.vjp(g, img, pts, wts)
        return (np.asarray(out), *map(np.asarray, vjp(og)))

    got = f("pallas")
    want = f("reference")
    names = ["out", "img_grad", "pts_grad", "wts_grad"]
    for name, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            a, b, atol=2e-5, rtol=2e-5,
            err_msg=f"{name} mismatch ({padding_mode}, ac={align_corners})",
        )


@requires_tpu
@pytest.mark.parametrize("padding_mode,align_corners", GRID)
def test_pallas_vs_reference_tpu(padding_mode, align_corners):
    _run_pair(padding_mode, align_corners)


@pytest.mark.skipif(has_tpu(), reason="covered compiled on TPU")
def test_pallas_interpret_mode_cpu():
    """Kernel logic via the Pallas interpreter on CPU (one config)."""
    _pf.INTERPRET = True
    jax.clear_caches()
    try:
        _run_pair("border", False)
    finally:
        _pf.INTERPRET = False
        jax.clear_caches()


@requires_tpu
def test_pallas_bf16_tpu():
    import jax.numpy as jnp

    img, shapes, pts, wts, _ = get_functional_data()
    got = np.asarray(
        msda(
            jnp.asarray(img, jnp.bfloat16), shapes,
            jnp.asarray(pts, jnp.bfloat16), jnp.asarray(wts, jnp.bfloat16),
            "border", True, impl="pallas",
        ).astype(jnp.float32)
    )
    want = np.asarray(
        msda(img, shapes, pts, wts, "border", True, impl="reference")
    )
    np.testing.assert_allclose(got, want, atol=1.5e-1, rtol=1.5e-1)


@requires_tpu
def test_pallas_nondivisible_queries_tpu():
    """N not a multiple of the query block exercises the padding path."""
    img, shapes, pts, wts, og = get_functional_data(N=130, oob=True)

    def f(impl):
        return np.asarray(
            msda(img, shapes, pts, wts, "zeros", True, impl=impl)
        )

    np.testing.assert_allclose(
        f("pallas"), f("reference"), atol=2e-5, rtol=2e-5
    )
