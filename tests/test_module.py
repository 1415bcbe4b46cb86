"""MultiscaleDeformableAttention module tests.

Goes beyond the reference's smoke-only module test
(/root/reference/tests/test_msda.py:161-168): numerically validates the
full module math (projections, softmax over L*P, reference-point handling
including the documented (h, w) offset-normalizer quirk at
frontend.py:275) against an independent numpy+grid_sample recomputation.
"""

import jax
import numpy as np
import pytest

from msda_tpu.models import MultiscaleDeformableAttention
from oracle import torch_msda_oracle
from utils import get_module_data


def _module_math_numpy(params, img, img_shapes, queries, refs,
                       H, L, P, hidden, padding_mode, align_corners,
                       normalizer_order):
    """Recompute the module forward with numpy + the torch oracle core."""
    p = params["params"]

    def dense(x, name):
        k = np.asarray(p[name]["kernel"])
        b = np.asarray(p[name]["bias"])
        return x @ k + b

    B, N, _ = queries.shape
    B, I, _ = img.shape  # noqa: E741

    q = dense(queries, "query_input_proj").reshape(B, N, H, L, P, 3)
    offsets, logits = q[..., :2], q[..., 2]
    flat = logits.reshape(B, N, H, L * P)
    e = np.exp(flat - flat.max(-1, keepdims=True))
    attn = (e / e.sum(-1, keepdims=True)).reshape(B, N, H, L, P)

    img_p = dense(img, "img_input_proj").reshape(B, I, H, hidden // H)

    shapes = np.asarray(img_shapes, np.float32)
    if refs.shape[-1] == 2:
        norm = shapes if normalizer_order == "reference" else shapes[:, ::-1]
        pts = refs[:, :, None, None, None, :] + offsets / norm[:, None, :]
    else:
        pts = (refs[:, :, None, None, None, :2]
               + offsets * refs[:, :, None, None, None, 2:] / (2 * P))

    out = torch_msda_oracle(
        img_p.astype(np.float32), img_shapes, pts.astype(np.float32),
        attn.astype(np.float32), padding_mode, align_corners,
    )
    out = out.reshape(B, N, hidden)
    return dense(out, "query_output_proj")


@pytest.mark.parametrize("coords", [2, 4])
@pytest.mark.parametrize("normalizer", ["reference", "detr"])
def test_module_numerical_parity(coords, normalizer):
    H, L, P, emb = 4, 4, 3, 64
    img, shapes, queries, refs = get_module_data(B=2, C=emb, N=40, coords=coords)
    mod = MultiscaleDeformableAttention(
        emb_dim=emb, hidden_dim=emb, num_levels=L, num_heads=H, num_points=P,
        padding_mode="border", align_corners=True,
        offset_normalizer=normalizer, impl="reference",
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = mod.init(jax.random.PRNGKey(0), img, shapes, queries, refs)
        got = np.asarray(mod.apply(params, img, shapes, queries, refs))
    want = _module_math_numpy(
        jax.device_get(params), img, shapes, queries, refs,
        H, L, P, emb, "border", True, normalizer,
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_module_invalid_refs():
    H, L, P, emb = 4, 4, 2, 64
    img, shapes, queries, refs = get_module_data(B=1, C=emb, N=8, coords=2)
    mod = MultiscaleDeformableAttention(
        emb_dim=emb, hidden_dim=emb, num_levels=L, num_heads=H, num_points=P,
    )
    bad_refs = np.zeros((1, 8, 3), np.float32)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu), pytest.raises(ValueError):
        mod.init(jax.random.PRNGKey(0), img, shapes, queries, bad_refs)


def test_module_hidden_dim_validation():
    mod = MultiscaleDeformableAttention(
        emb_dim=64, hidden_dim=65, num_levels=4, num_heads=4, num_points=2,
    )
    img, shapes, queries, refs = get_module_data(B=1, C=64, N=8, coords=2)
    with pytest.raises(ValueError):
        mod.init(jax.random.PRNGKey(0), img, shapes, queries, refs)


def test_module_grad_flows():
    """Gradients reach all module params through the custom-vjp op."""
    import jax.numpy as jnp

    H, L, P, emb = 4, 4, 2, 64
    img, shapes, queries, refs = get_module_data(B=1, C=emb, N=16, coords=2)
    mod = MultiscaleDeformableAttention(
        emb_dim=emb, hidden_dim=emb, num_levels=L, num_heads=H, num_points=P,
        impl="reference",
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = mod.init(jax.random.PRNGKey(0), img, shapes, queries, refs)

        def loss(params):
            return jnp.sum(mod.apply(params, img, shapes, queries, refs) ** 2)

        grads = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(np.abs(np.asarray(g)).max()) > 0 for g in leaves)


def test_module_f64_path_keeps_precision(cpu_device):
    """Under jax_enable_x64 with f64 inputs the module's point/weight math
    must stay f64 (the geometry promotion is to *at least* f32, not a
    hard downcast) — the f64-capable interpreter path the README
    advertises."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from msda_tpu.models import MultiscaleDeformableAttention

    rng = np.random.default_rng(11)
    shapes = np.array([(4, 4), (2, 2)], np.int32)
    model = MultiscaleDeformableAttention(
        emb_dim=16, hidden_dim=16, num_levels=2, num_heads=2,
        num_points=2, impl="reference", param_dtype=jnp.float64,
    )
    with jax.default_device(cpu_device):
        img = jnp.asarray(rng.standard_normal((1, 20, 16)), jnp.float64)
        queries = jnp.asarray(rng.standard_normal((1, 3, 16)), jnp.float64)
        refs = jnp.asarray(rng.random((1, 3, 2)), jnp.float64)
        params = model.init(jax.random.PRNGKey(0), img, shapes, queries, refs)
        out = model.apply(params, img, shapes, queries, refs)
    assert out.dtype == jnp.float64
    assert np.isfinite(np.asarray(out)).all()
