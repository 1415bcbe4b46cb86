"""AOT export (jax.export) round-trips for serving.

Covers the bare op and the full detector (forward + postprocess) through
serialize -> deserialize -> call, asserting numerical identity with the
live jitted function.  Uses the portable XLA impl; the Pallas path
exports TPU custom calls and is exercised on TPU only (see
utils/export.py platform note).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import requires_tpu
from msda_tpu.utils import export_fn, load_exported, save_exported, \
    load_exported_file


def test_export_op_round_trip(cpu_device):
    from msda_tpu.ops import multiscale_deformable_attention as msda

    rng = np.random.default_rng(0)
    shapes = np.array([(8, 8), (4, 4)], np.int32)
    I = int((shapes[:, 0] * shapes[:, 1]).sum())  # noqa: E741
    img = jnp.asarray(rng.standard_normal((2, I, 2, 8)), jnp.float32)
    pts = jnp.asarray(rng.random((2, 10, 2, 2, 3, 2)), jnp.float32)
    wts = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((2, 10, 2, 2, 3)), jnp.float32), -1)

    def fn(img, pts, wts):
        return msda(img, shapes, pts, wts, "border", False, impl="reference")

    with jax.default_device(cpu_device):
        # explicit platform: on a TPU machine the default lowering platform
        # is "tpu", which a cpu-pinned call site would then reject
        blob = export_fn(fn, img, pts, wts, platforms=("cpu",))
        got = load_exported(blob)(img, pts, wts)
        want = jax.jit(fn)(img, pts, wts)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_export_detector_with_postprocess(cpu_device, tmp_path):
    """Full serving pipeline — detector forward + top-k decode — exported
    as ONE artifact (params baked as arguments), saved to disk, reloaded,
    and numerically identical to the live model."""
    from msda_tpu.models.detr import DeformableDetr, postprocess

    shapes = np.array([(8, 8), (4, 4)], np.int32)
    model = DeformableDetr(
        num_classes=5, emb_dim=32, num_heads=4, num_points=2,
        num_queries=8, num_encoder_layers=1, num_decoder_layers=1,
        ffn_dim=64, impl="reference",
    )
    rng = np.random.default_rng(1)
    pyramid = [
        jnp.asarray(rng.standard_normal((1, h, w, 16)), jnp.float32)
        for h, w in [(8, 8), (4, 4)]
    ]

    def serve(params, *pyr):
        out = model.apply(params, list(pyr), shapes)
        return postprocess(out, top_k=5)

    with jax.default_device(cpu_device):
        params = model.init(jax.random.PRNGKey(0), pyramid, shapes)
        blob = export_fn(serve, params, *pyramid, platforms=("cpu",))
        path = tmp_path / "detector.stablehlo"
        save_exported(blob, path)
        got = load_exported_file(path)(params, *pyramid)
        want = jax.jit(serve)(params, *pyramid)

    assert got["scores"].shape == (1, 5)
    for k in ("scores", "labels", "boxes"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-6, atol=1e-6)


@requires_tpu
@pytest.mark.slow
def test_export_pallas_op_round_trip_tpu():
    """The Pallas path exports for TPU serving: the Mosaic kernel rides
    along as a custom call in the serialized artifact and the reloaded
    function matches the live op on-device."""
    from msda_tpu.ops import multiscale_deformable_attention as msda

    rng = np.random.default_rng(2)
    shapes = np.array([(16, 16), (8, 8)], np.int32)
    I = int((shapes[:, 0] * shapes[:, 1]).sum())  # noqa: E741
    img = jnp.asarray(rng.standard_normal((2, I, 2, 32)), jnp.float32)
    pts = jnp.asarray(rng.random((2, 64, 2, 2, 3, 2)), jnp.float32)
    wts = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((2, 64, 2, 2, 3)), jnp.float32), -1)

    def fn(img, pts, wts):
        return msda(img, shapes, pts, wts, "border", False, impl="pallas")

    # export_fn auto-bypasses the forward-compat lowering here: under the
    # suite's jax_enable_x64=True it mis-lowers the Mosaic payload to i64
    # index vectors that the TPU compiler rejects (see utils/export.py).
    blob = export_fn(fn, img, pts, wts, platforms=("tpu",))

    got = load_exported(blob)(img, pts, wts)
    want = jax.jit(fn)(img, pts, wts)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
