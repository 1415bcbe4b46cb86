"""Randomized-geometry sweep for the STREAMED kernels (interpret mode).

tests/test_fuzz.py pins the XLA paths to the torch oracle across random
ragged workloads; this does the same for ops.pallas_stream through the
Pallas interpreter on CPU — the streamed path has its own level-band
layout math (row pitch, band count, query blocking), so fixed-geometry
tests alone leave its edge geometry unexercised.  Small sizes: interpret
mode executes the kernel body per grid step in Python.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from msda_tpu.ops import pallas_stream as ps
from oracle import torch_msda_oracle_grads
from test_fuzz import fuzz_seeds

N_CASES = 6
N_FAST = 3  # seeds 0-2 run in every CI pass (VERDICT r3 item 8)


def _random_case(seed):
    rng = np.random.default_rng(7000 + seed)
    B = int(rng.integers(1, 3))
    H = int(rng.integers(1, 4))
    C = int(rng.choice([2, 8, 16]))
    L = int(rng.integers(1, 4))
    P = int(rng.integers(1, 5))
    N = int(rng.integers(1, 49))
    # ragged, non-square levels incl. 1-pixel rows/cols
    shapes = np.stack(
        [rng.integers(1, 13, size=2) for _ in range(L)]
    ).astype(np.int32)
    I = int((shapes[:, 0] * shapes[:, 1]).sum())  # noqa: E741
    img = rng.standard_normal((B, I, H, C)).astype(np.float32)
    pts = (rng.random((B, N, H, L, P, 2)) * 2.4 - 0.7).astype(np.float32)
    logits = rng.standard_normal((B, N, H, L, P))
    e = np.exp(logits - logits.max(axis=(-1, -2), keepdims=True))
    wts = (e / e.sum(axis=(-1, -2), keepdims=True)).astype(np.float32)
    og = rng.random((B, N, H, C)).astype(np.float32)
    padding_mode = str(rng.choice(["border", "zeros"]))
    align_corners = bool(rng.integers(0, 2))
    return img, shapes, pts, wts, og, padding_mode, align_corners


@pytest.mark.parametrize("seed", fuzz_seeds(N_CASES, N_FAST))
def test_stream_random_geometry_matches_oracle(monkeypatch, seed):
    img, shapes, pts, wts, og, padding_mode, align_corners = _random_case(
        seed)
    # odd half of the sweep: tiny query blocks, so most cases take >1
    # step on the query grid axis (the accumulation regression surface)
    if seed % 2:
        monkeypatch.setattr(ps, "N_BLOCK_STREAM", 16)
    shapes_tuple = tuple((int(h), int(w)) for h, w in shapes)

    got_out = ps.stream_fwd(
        jnp.asarray(img), jnp.asarray(pts), jnp.asarray(wts),
        shapes_tuple=shapes_tuple, padding_mode=padding_mode,
        align_corners=align_corners, scheme="highest", interpret=True)
    ig, pg, wg = ps.stream_bwd(
        jnp.asarray(img), jnp.asarray(pts), jnp.asarray(wts),
        jnp.asarray(og), shapes_tuple=shapes_tuple,
        padding_mode=padding_mode, align_corners=align_corners,
        scheme="highest", interpret=True)

    want_out, want_ig, want_pg, want_wg = torch_msda_oracle_grads(
        img, shapes, pts, wts, og, padding_mode, align_corners)

    label = (f"seed={seed} pad={padding_mode} align={align_corners} "
             f"shapes={shapes.tolist()}")
    np.testing.assert_allclose(
        np.asarray(got_out), want_out, atol=1e-5, rtol=1e-5, err_msg=label)
    np.testing.assert_allclose(
        np.asarray(ig), want_ig, atol=1e-4, rtol=1e-4, err_msg=label)
    np.testing.assert_allclose(
        np.asarray(wg), want_wg, atol=1e-4, rtol=1e-4, err_msg=label)
    np.testing.assert_allclose(
        np.asarray(pg), want_pg, atol=1e-4, rtol=1e-4, err_msg=label)
