"""Randomized-geometry consistency sweep (deterministic seeds).

The fixed-geometry matrix elsewhere mirrors the reference's fixtures
(/root/reference/tests/test_msda.py:30-62); this sweep drives the same
oracle across *randomized* workloads — ragged non-square pyramids, odd
L/P/C/H, tiny and 1-pixel levels, genuinely OOB points, random
padding_mode / align_corners — so semantics hold everywhere in the input
space, not just at the benchmark point.  CPU-only (jnp reference + fused
XLA paths); the Pallas kernels are pinned to these same semantics by the
TPU equivalence tests.
"""

import jax
import numpy as np
import pytest

from msda_tpu.ops import multiscale_deformable_attention as msda
from oracle import torch_msda_oracle, torch_msda_oracle_grads

N_CASES = 12
# first seeds run in the fast lane so every CI run covers several draws of
# the ragged-geometry space (VERDICT r3 item 8); the rest stay slow
# (every case is a distinct compile)
N_FAST = 3


def fuzz_seeds(n_cases, n_fast):
    return [
        seed if seed < n_fast
        else pytest.param(seed, marks=pytest.mark.slow)
        for seed in range(n_cases)
    ]


def _random_case(seed):
    rng = np.random.default_rng(1000 + seed)
    B = int(rng.integers(1, 3))
    H = int(rng.integers(1, 5))
    C = int(rng.choice([2, 3, 8, 16, 33]))
    L = int(rng.integers(1, 5))
    P = int(rng.integers(1, 6))
    N = int(rng.integers(1, 70))
    # ragged, non-square levels incl. 1-pixel rows/cols
    shapes = np.stack(
        [rng.integers(1, 20, size=2) for _ in range(L)]
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
@pytest.mark.parametrize("impl", ["reference", "fused"])
def test_random_geometry_matches_oracle(impl, seed, cpu_device):
    img, shapes, pts, wts, og, padding_mode, align_corners = _random_case(
        seed)

    def f(i, p, w):
        return msda(i, shapes, p, w, padding_mode, align_corners, impl=impl)

    # CPU-pinned (as documented above): the sweep's distinct geometries
    # must not each trigger a remote TPU compile in the fast lane
    with jax.default_device(cpu_device):
        out, vjp = jax.vjp(f, img, pts, wts)
        ig, pg, wg = vjp(og)

    want_out, want_ig, want_pg, want_wg = torch_msda_oracle_grads(
        img, shapes, pts, wts, og, padding_mode, align_corners)

    label = (f"seed={seed} impl={impl} pad={padding_mode} "
             f"align={align_corners} shapes={shapes.tolist()}")
    np.testing.assert_allclose(
        np.asarray(out), want_out, atol=1e-5, rtol=1e-5, err_msg=label)
    np.testing.assert_allclose(
        np.asarray(ig), want_ig, atol=1e-4, rtol=1e-4, err_msg=label)
    np.testing.assert_allclose(
        np.asarray(wg), want_wg, atol=1e-4, rtol=1e-4, err_msg=label)
    np.testing.assert_allclose(
        np.asarray(pg), want_pg, atol=1e-4, rtol=1e-4, err_msg=label)
