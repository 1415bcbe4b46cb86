"""torch -> flax weight migration for the attention module.

Pins the layout convention (torch Linear weight [out, in] vs flax Dense
kernel [in, out]) against torch's own functional linear, the pytree
structure against model.init, and the round-trip inverse.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from msda_tpu.models import (
    MultiscaleDeformableAttention,
    attention_params_from_torch,
    attention_params_to_torch,
)

EMB, HID, L, H, P = 32, 32, 2, 4, 2


def _torch_state(seed=0):
    g = torch.Generator().manual_seed(seed)
    sizes = {
        "img_input_proj": (HID, EMB),
        "query_input_proj": (H * L * P * 3, EMB),
        "query_output_proj": (EMB, HID),
    }
    sd = {}
    for name, (out, inp) in sizes.items():
        sd[f"{name}.weight"] = torch.randn(out, inp, generator=g)
        sd[f"{name}.bias"] = torch.randn(out, generator=g)
    return sd


def _model():
    return MultiscaleDeformableAttention(
        emb_dim=EMB, hidden_dim=HID, num_levels=L, num_heads=H,
        num_points=P, impl="reference",
    )


def test_structure_matches_init():
    rng = np.random.default_rng(0)
    shapes = np.array([(4, 4), (2, 2)], np.int32)
    img = jnp.asarray(rng.standard_normal((1, 20, EMB)), jnp.float32)
    queries = jnp.asarray(rng.standard_normal((1, 3, EMB)), jnp.float32)
    refs = jnp.asarray(rng.random((1, 3, 2)), jnp.float32)

    model = _model()
    init_params = model.init(jax.random.PRNGKey(0), img, shapes, queries, refs)
    converted = attention_params_from_torch(_torch_state())

    assert jax.tree.structure(init_params) == jax.tree.structure(converted)
    for a, b in zip(jax.tree.leaves(init_params), jax.tree.leaves(converted)):
        assert a.shape == b.shape and a.dtype == b.dtype

    # the converted module runs end to end
    out = model.apply(converted, img, shapes, queries, refs)
    assert out.shape == (1, 3, EMB)
    assert np.isfinite(np.asarray(out)).all()


def test_each_projection_matches_torch_linear():
    import flax.linen as nn
    import torch.nn.functional as F

    sd = _torch_state(seed=1)
    converted = attention_params_from_torch(sd)["params"]
    rng = np.random.default_rng(1)
    for name in ("img_input_proj", "query_input_proj", "query_output_proj"):
        w, b = sd[f"{name}.weight"], sd[f"{name}.bias"]
        x = rng.standard_normal((5, w.shape[1])).astype(np.float32)
        want = F.linear(torch.from_numpy(x), w, b).numpy()
        dense = nn.Dense(w.shape[0])
        # layout test, not a precision test: pin full-f32 matmuls so it
        # also passes on TPU (whose default matmul precision is bf16)
        with jax.default_matmul_precision("highest"):
            got = dense.apply({"params": converted[name]}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_round_trip_inverse():
    sd = _torch_state(seed=2)
    params = attention_params_from_torch(sd)
    back = attention_params_to_torch(params)
    for k, v in sd.items():
        np.testing.assert_array_equal(back[k], v.numpy())
    again = attention_params_from_torch(back)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(again)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_key_error():
    sd = _torch_state()
    del sd["query_output_proj.bias"]
    with pytest.raises(KeyError, match="query_output_proj"):
        attention_params_from_torch(sd)


@pytest.mark.slow
def test_hf_module_parity_with_converted_weights():
    """The flax module loaded with a (random-init) HF
    DeformableDetrMultiscaleDeformableAttention state_dict reproduces the
    HF module's forward output — i.e. pretrained HF detectors migrate."""
    from transformers.models.deformable_detr.configuration_deformable_detr import (
        DeformableDetrConfig,
    )
    from transformers.models.deformable_detr.modeling_deformable_detr import (
        DeformableDetrMultiscaleDeformableAttention,
    )

    from msda_tpu.models import attention_params_from_hf

    D, Hh, Ll, Pp = 32, 4, 2, 2
    cfg = DeformableDetrConfig(
        d_model=D, num_feature_levels=Ll, use_timm_backbone=False,
        use_pretrained_backbone=False, backbone=None,
        backbone_config=None,
    )
    torch.manual_seed(0)
    hf = DeformableDetrMultiscaleDeformableAttention(
        cfg, num_heads=Hh, n_points=Pp)
    hf.eval()
    # random weights everywhere (HF zero-inits the offset head; random
    # makes the parity check non-trivial)
    with torch.no_grad():
        for p in hf.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
    hf.disable_custom_kernels = True

    rng = np.random.default_rng(3)
    shapes = np.array([(6, 5), (3, 3)], np.int32)
    I = int((shapes[:, 0] * shapes[:, 1]).sum())  # noqa: E741
    B, N = 2, 7
    img = rng.standard_normal((B, I, D)).astype(np.float32)
    queries = rng.standard_normal((B, N, D)).astype(np.float32)
    refs = rng.random((B, N, 2)).astype(np.float32)

    sizes = [int(h) * int(w) for h, w in shapes]
    level_start = torch.tensor(
        np.concatenate([[0], np.cumsum(sizes)[:-1]]), dtype=torch.int64)
    with torch.no_grad():
        want, _ = hf(
            hidden_states=torch.from_numpy(queries),
            encoder_hidden_states=torch.from_numpy(img),
            reference_points=torch.from_numpy(
                np.broadcast_to(refs[:, :, None, :], (B, N, Ll, 2)).copy()),
            spatial_shapes=torch.from_numpy(np.asarray(shapes, np.int64)),
            spatial_shapes_list=[(int(h), int(w)) for h, w in shapes],
            level_start_index=level_start,
        )
    want = want.numpy()

    model = MultiscaleDeformableAttention(
        emb_dim=D, hidden_dim=D, num_levels=Ll, num_heads=Hh,
        num_points=Pp, padding_mode="zeros", align_corners=False,
        offset_normalizer="detr", impl="reference",
    )
    params = attention_params_from_hf(
        hf.state_dict(), num_heads=Hh, num_levels=Ll, num_points=Pp)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(jax.jit(
            lambda p, i, q, r: model.apply(p, i, jnp.asarray(shapes), q, r)
        )(params, jnp.asarray(img), jnp.asarray(queries), jnp.asarray(refs)))

    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
