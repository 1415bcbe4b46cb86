"""Shared test data generators (analogue of the reference fixtures,
/root/reference/tests/test_msda.py:30-62, with the OOB gap fixed: sampling
points can be drawn genuinely out of [0, 1])."""

from __future__ import annotations

import numpy as np

# Default functional-test geometry. P=3 is deliberately not a power of two,
# matching the reference fixture's block-padding stress (test_msda.py:31).
DEFAULT_CFG = dict(B=2, H=4, C=32, L=4, N=80, P=3)


def make_pyramid_shapes(L: int, base: int = 16):
    return np.array([(base // 2**i, base // 2**i) for i in range(L)], np.int32)


def get_functional_data(
    B=None, H=None, C=None, L=None, N=None, P=None,
    dtype=np.float32,
    seed=0,
    oob=False,
    base=16,
):
    cfg = dict(DEFAULT_CFG)
    for k, v in dict(B=B, H=H, C=C, L=L, N=N, P=P).items():
        if v is not None:
            cfg[k] = v
    B, H, C, L, N, P = (cfg[k] for k in "BHCLNP")

    rng = np.random.default_rng(seed)
    shapes = make_pyramid_shapes(L, base)
    I = int((shapes[:, 0] * shapes[:, 1]).sum())  # noqa: E741

    img = rng.standard_normal((B, I, H, C)).astype(dtype)
    if oob:
        # genuinely out-of-bounds points in [-0.5, 1.5]
        pts = (rng.random((B, N, H, L, P, 2)) * 2.0 - 0.5).astype(dtype)
    else:
        pts = rng.random((B, N, H, L, P, 2)).astype(dtype)
    logits = rng.standard_normal((B, N, H, L, P))
    e = np.exp(logits - logits.max(axis=(-1, -2), keepdims=True))
    wts = (e / e.sum(axis=(-1, -2), keepdims=True)).astype(dtype)
    out_grad = rng.random((B, N, H, C)).astype(dtype)
    return img, shapes, pts, wts, out_grad


def get_module_data(B=2, C=64, L=4, N=50, coords=2, seed=0, base=16):
    rng = np.random.default_rng(seed)
    shapes = make_pyramid_shapes(L, base)
    I = int((shapes[:, 0] * shapes[:, 1]).sum())  # noqa: E741
    img = rng.standard_normal((B, I, C)).astype(np.float32)
    queries = rng.standard_normal((B, N, C)).astype(np.float32)
    reference_points = rng.standard_normal((B, N, coords)).astype(np.float32)
    return img, shapes, queries, reference_points
