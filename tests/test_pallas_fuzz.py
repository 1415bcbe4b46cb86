"""Randomized-geometry sweep for the RESIDENT kernels (interpret mode).

Companion to tests/test_fuzz.py (XLA paths) and tests/test_stream_fuzz.py
(streamed kernels): the resident kernels' level layout (sublane-padded row
pitch, per-level bands, ragged query-tail masking) is its own arithmetic,
and the compiled-TPU matrix only exercises it at fixed fixture geometry.
This sweeps randomized ragged pyramids through the Pallas interpreter on
CPU against the torch oracle — forward and all three gradients.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from msda_tpu.ops.pallas_fwd import pallas_multiscale_deformable_attention
from msda_tpu.ops.pallas_bwd import pallas_msda_bwd
from oracle import torch_msda_oracle_grads
from test_fuzz import _random_case, fuzz_seeds

N_CASES = 6
N_FAST = 3  # seeds 0-2 run in every CI pass (VERDICT r3 item 8)


@pytest.mark.parametrize("seed", fuzz_seeds(N_CASES, N_FAST))
def test_resident_random_geometry_matches_oracle(seed):
    # reuse test_fuzz's case generator (seeds offset so the two sweeps
    # cover different geometries)
    img, shapes, pts, wts, og, padding_mode, align_corners = _random_case(
        100 + seed)

    got_out = pallas_multiscale_deformable_attention(
        jnp.asarray(img), shapes, jnp.asarray(pts), jnp.asarray(wts),
        padding_mode, align_corners, precision="highest", interpret=True)
    ig, pg, wg = pallas_msda_bwd(
        jnp.asarray(img), shapes, jnp.asarray(pts), jnp.asarray(wts),
        jnp.asarray(og), padding_mode, align_corners,
        precision="highest", interpret=True)

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
