"""Deformable-DETR model family tests (forward, loss, train step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msda_tpu.models.detr import (
    DeformableDetr,
    make_encoder_reference_points,
)
from msda_tpu.parallel.train import detection_loss

SHAPES = np.array([(8, 8), (4, 4), (2, 2)], np.int32)
LEVEL_DIMS = [(8, 8), (4, 4), (2, 2)]


def _pyramid(batch, rng):
    return [
        jnp.asarray(rng.standard_normal((batch, h, w, 16)), jnp.float32)
        for h, w in LEVEL_DIMS
    ]


def _model():
    return DeformableDetr(
        num_classes=5, emb_dim=32, num_heads=4, num_points=2,
        num_queries=8, num_encoder_layers=1, num_decoder_layers=1,
        ffn_dim=64, impl="reference",
    )


def test_encoder_reference_points():
    refs = make_encoder_reference_points(SHAPES)
    assert refs.shape == (64 + 16 + 4, 2)
    r = np.asarray(refs)
    assert (r > 0).all() and (r < 1).all()
    # first pixel of an 8x8 level is centered at 1/16
    np.testing.assert_allclose(r[0], [1 / 16, 1 / 16])


def test_detr_forward_shapes():
    rng = np.random.default_rng(0)
    model = _model()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pyr = _pyramid(2, rng)
        params = model.init(jax.random.PRNGKey(0), pyr, SHAPES)
        out = model.apply(params, pyr, SHAPES)
    assert out["logits"].shape == (2, 8, 5)
    assert out["boxes"].shape == (2, 8, 4)
    b = np.asarray(out["boxes"])
    assert (b >= 0).all() and (b <= 1).all()


def test_detr_train_step_decreases_loss():
    import optax

    rng = np.random.default_rng(0)
    model = _model()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pyr = _pyramid(2, rng)
        params = model.init(jax.random.PRNGKey(0), pyr, SHAPES)
        targets = {
            "labels": jnp.asarray(rng.integers(0, 5, (2, 8)), jnp.int32),
            "boxes": jnp.asarray(rng.random((2, 8, 4)), jnp.float32),
            "mask": jnp.ones((2, 8), jnp.float32),
        }
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                return detection_loss(model.apply(p, pyr, SHAPES), targets)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        losses = []
        for _ in range(5):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_detr_box_refinement_and_aux():
    """with_box_refinement=True returns per-layer aux predictions and the
    refined boxes differ from the unrefined model's."""
    from msda_tpu.models.detr import DeformableDetr

    shapes = np.array([(8, 8), (4, 4)], np.int32)
    rng = np.random.default_rng(0)
    pyramid = [
        jnp.asarray(rng.standard_normal((2, int(h), int(w), 16)), jnp.float32)
        for h, w in shapes
    ]
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = DeformableDetr(
            num_classes=5, emb_dim=32, num_heads=4, num_points=2,
            num_queries=8, num_encoder_layers=1, num_decoder_layers=2,
            ffn_dim=64, with_box_refinement=True, impl="reference",
        )
        params = model.init(jax.random.PRNGKey(0), pyramid, shapes)
        out = jax.jit(
            lambda p: model.apply(p, pyramid, shapes)
        )(params)
    assert out["logits"].shape == (2, 8, 5)
    assert out["boxes"].shape == (2, 8, 4)
    # aux predictions: one per non-final decoder layer
    assert len(out["aux"]) == 1
    for a in out["aux"]:
        assert a["logits"].shape == (2, 8, 5)
        assert a["boxes"].shape == (2, 8, 4)
    assert np.all(np.isfinite(np.asarray(out["boxes"])))
    # refinement heads exist per layer
    names = set(params["params"].keys())
    assert "box_refine_0" in names, names


def test_postprocess_sigmoid():
    from msda_tpu.models import postprocess

    rng = np.random.default_rng(1)
    B, N, K = 2, 6, 4
    logits = jnp.asarray(rng.standard_normal((B, N, K)), jnp.float32)
    boxes = jnp.asarray(rng.random((B, N, 4)), jnp.float32)
    out = jax.jit(lambda o: postprocess(o, top_k=5, scoring="sigmoid"))(
        {"logits": logits, "boxes": boxes}
    )
    assert out["scores"].shape == (B, 5)
    assert out["labels"].shape == (B, 5)
    assert out["boxes"].shape == (B, 5, 4)
    # numpy cross-check of the top-1 detection
    s = 1.0 / (1.0 + np.exp(-np.asarray(logits).reshape(B, N * K)))
    for b in range(B):
        flat = int(s[b].argmax())
        assert float(out["scores"][b, 0]) == pytest.approx(float(s[b].max()), rel=1e-6)
        assert int(out["labels"][b, 0]) == flat % K
        np.testing.assert_allclose(
            np.asarray(out["boxes"][b, 0]), np.asarray(boxes[b, flat // K])
        )
    # scores sorted descending
    assert np.all(np.diff(np.asarray(out["scores"]), axis=1) <= 1e-7)


def test_postprocess_softmax_drops_background():
    """Default scoring pairs with detection_loss's CE convention: the last
    class is background and must never be emitted as a detection."""
    from msda_tpu.models import postprocess

    rng = np.random.default_rng(3)
    B, N, K = 2, 6, 4  # class K-1 = background
    logits = np.asarray(rng.standard_normal((B, N, K)), np.float32)
    # make background the argmax for every query: it must still not win
    logits[..., -1] += 10.0
    boxes = jnp.asarray(rng.random((B, N, 4)), jnp.float32)
    out = jax.jit(lambda o: postprocess(o, top_k=5))(
        {"logits": jnp.asarray(logits), "boxes": boxes}
    )
    labels = np.asarray(out["labels"])
    assert labels.max() < K - 1, "background class emitted as a detection"
    # scores are softmax posteriors of real classes
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = (e / e.sum(-1, keepdims=True))[..., :-1].reshape(B, N * (K - 1))
    for b in range(B):
        assert float(out["scores"][b, 0]) == pytest.approx(
            float(probs[b].max()), rel=1e-5)
    with pytest.raises(ValueError):
        postprocess({"logits": jnp.asarray(logits), "boxes": boxes},
                    scoring="bogus")


def test_detection_loss_aux_deep_supervision():
    """Aux predictions add per-layer losses; aux_weight=0 recovers the
    final-layer-only loss."""
    rng = np.random.default_rng(2)
    B, N, K = 2, 8, 5
    outputs = {
        "logits": jnp.asarray(rng.standard_normal((B, N, K)), jnp.float32),
        "boxes": jnp.asarray(rng.random((B, N, 4)), jnp.float32),
        "aux": [{
            "logits": jnp.asarray(rng.standard_normal((B, N, K)), jnp.float32),
            "boxes": jnp.asarray(rng.random((B, N, 4)), jnp.float32),
        }],
    }
    targets = {
        "labels": jnp.asarray(rng.integers(0, K - 1, (B, N)), jnp.int32),
        "boxes": jnp.asarray(rng.random((B, N, 4)), jnp.float32),
        "mask": jnp.ones((B, N), jnp.float32),
    }
    no_aux = {k: v for k, v in outputs.items() if k != "aux"}
    l_final = float(detection_loss(no_aux, targets))
    l_zero = float(detection_loss(outputs, targets, aux_weight=0.0))
    l_full = float(detection_loss(outputs, targets, aux_weight=1.0))
    l_aux_only = float(detection_loss(
        {**outputs["aux"][0]}, targets))
    assert l_zero == pytest.approx(l_final, rel=1e-6)
    assert l_full == pytest.approx(l_final + l_aux_only, rel=1e-6)


def test_detr_two_stage():
    """two_stage=True: encoder proposals seed the decoder references; the
    model returns enc outputs for proposal supervision."""
    from msda_tpu.models.detr import DeformableDetr

    shapes = np.array([(8, 8), (4, 4)], np.int32)
    I = int((shapes[:, 0] * shapes[:, 1]).sum())
    rng = np.random.default_rng(4)
    pyramid = [
        jnp.asarray(rng.standard_normal((2, int(h), int(w), 16)), jnp.float32)
        for h, w in shapes
    ]
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = DeformableDetr(
            num_classes=5, emb_dim=32, num_heads=4, num_points=2,
            num_queries=8, num_encoder_layers=1, num_decoder_layers=1,
            ffn_dim=64, two_stage=True, impl="reference",
        )
        params = model.init(jax.random.PRNGKey(0), pyramid, shapes)
        out = jax.jit(lambda p: model.apply(p, pyramid, shapes))(params)

        # gradients flow into the proposal heads through the REAL training
        # objective: detection_loss consumes outputs["enc"] (objectness +
        # box loss on anchor-assigned proposals) — without that term the
        # proposal heads would stay at init (decoder uses detached refs)
        rng2 = np.random.default_rng(5)
        targets = {
            "labels": jnp.asarray(rng2.integers(0, 4, (2, 8)), jnp.int32),
            "boxes": jnp.asarray(rng2.random((2, 8, 4)) * 0.5 + 0.25,
                                 jnp.float32),
            "mask": jnp.ones((2, 8), jnp.float32),
        }

        def loss(p):
            return detection_loss(model.apply(p, pyramid, shapes), targets)

        grads = jax.jit(jax.grad(loss))(params)

        # enc_weight=0 removes the enc term entirely
        l_full = float(jax.jit(loss)(params))
        l_no_enc = float(detection_loss(out, targets, enc_weight=0.0))
        l_dec_only = float(detection_loss(
            {k: v for k, v in out.items() if k != "enc"}, targets))
    assert out["logits"].shape == (2, 8, 5)
    assert out["boxes"].shape == (2, 8, 4)
    assert out["enc"]["boxes"].shape == (2, I, 4)
    assert out["enc"]["anchors"].shape == (I, 4)
    assert np.all(np.isfinite(np.asarray(out["boxes"])))
    g_enc = grads["params"]["enc_box_head"]["kernel"]
    assert float(np.abs(np.asarray(g_enc)).max()) > 0
    g_obj = grads["params"]["enc_objectness"]["kernel"]
    assert float(np.abs(np.asarray(g_obj)).max()) > 0
    assert l_no_enc == pytest.approx(l_dec_only, rel=1e-6)
    assert l_full > l_no_enc  # enc term is active and positive


def test_detr_remat_matches_no_remat():
    """remat=True (jax.checkpoint over encoder/decoder layers) must be a
    pure memory/FLOPs trade: same forward outputs and same gradients as
    the un-rematerialized model for identical parameters."""
    rng = np.random.default_rng(7)

    def build(remat):
        return DeformableDetr(
            num_classes=5, emb_dim=32, num_heads=4, num_points=2,
            num_queries=8, num_encoder_layers=2, num_decoder_layers=2,
            ffn_dim=64, with_box_refinement=True, impl="reference",
            remat=remat,
        )

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pyr = _pyramid(2, rng)
        params = build(False).init(jax.random.PRNGKey(0), pyr, SHAPES)

        targets = {
            "labels": jnp.asarray(rng.integers(0, 4, (2, 8)), jnp.int32),
            "boxes": jnp.asarray(rng.random((2, 8, 4)), jnp.float32),
            "mask": jnp.ones((2, 8), jnp.float32),
        }

        def loss(p, remat):
            out = build(remat).apply(p, pyr, SHAPES)
            return detection_loss(out, targets)

        l0, g0 = jax.jit(
            jax.value_and_grad(lambda p: loss(p, False)))(params)
        l1, g1 = jax.jit(
            jax.value_and_grad(lambda p: loss(p, True)))(params)

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    assert len(flat0) == len(flat1)
    # not bit-exact: the rematerialized backward recomputes activations
    # through a different XLA fusion/ordering, so f32 roundoff of a few
    # ulps accumulates through the decoder stack
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_detr_bf16_compute_policy():
    """compute_dtype=bf16: f32 master params, bf16 activations through the
    stack, f32 heads/boxes — outputs stay close to the f32 model and the
    loss is differentiable with finite grads."""
    rng = np.random.default_rng(9)

    def build(cd):
        return DeformableDetr(
            num_classes=5, emb_dim=32, num_heads=4, num_points=2,
            num_queries=8, num_encoder_layers=1, num_decoder_layers=1,
            ffn_dim=64, impl="reference", compute_dtype=cd,
        )

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        pyr = _pyramid(2, rng)
        params = build(None).init(jax.random.PRNGKey(0), pyr, SHAPES)
        # master params are f32 regardless of compute dtype
        assert all(
            leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(params))

        out32 = jax.jit(lambda p: build(None).apply(p, pyr, SHAPES))(params)
        out16 = jax.jit(
            lambda p: build(jnp.bfloat16).apply(p, pyr, SHAPES))(params)

        # heads emit f32 under the mixed policy
        assert out16["logits"].dtype == jnp.float32
        assert out16["boxes"].dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(out16["boxes"]), np.asarray(out32["boxes"]),
            atol=0.05)
        np.testing.assert_allclose(
            np.asarray(out16["logits"]), np.asarray(out32["logits"]),
            atol=0.25)

        targets = {
            "labels": jnp.asarray(rng.integers(0, 4, (2, 8)), jnp.int32),
            "boxes": jnp.asarray(rng.random((2, 8, 4)), jnp.float32),
            "mask": jnp.ones((2, 8), jnp.float32),
        }
        loss, grads = jax.jit(jax.value_and_grad(
            lambda p: detection_loss(
                build(jnp.bfloat16).apply(p, pyr, SHAPES), targets)
        ))(params)
        assert np.isfinite(float(loss))
        for g in jax.tree.leaves(grads):
            assert np.isfinite(np.asarray(g)).all()
            assert g.dtype == jnp.float32


def test_postprocess_absolute_xyxy():
    """image_sizes converts the decoded boxes to absolute (x0, y0, x1, y1)
    pixel coordinates — the HF post-processor convention."""
    from msda_tpu.models.detr import postprocess

    logits = jnp.asarray([[[5.0, 0.0, -5.0]]])       # 1 query, 3 classes
    boxes = jnp.asarray([[[0.5, 0.25, 0.2, 0.1]]])   # cxcywh normalized
    out = postprocess({"logits": logits, "boxes": boxes}, top_k=1,
                      image_sizes=jnp.asarray([[200, 100]]))  # (h, w)
    got = np.asarray(out["boxes"])[0, 0]
    # cx*w=50, cy*h=50, half-extents 10 / 10 -> (40, 40, 60, 60)
    np.testing.assert_allclose(got, [40.0, 40.0, 60.0, 60.0], atol=1e-4)
    # default stays normalized cxcywh
    out2 = postprocess({"logits": logits, "boxes": boxes}, top_k=1)
    np.testing.assert_allclose(
        np.asarray(out2["boxes"])[0, 0], [0.5, 0.25, 0.2, 0.1], atol=1e-6)
