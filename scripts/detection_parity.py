"""Full-model detection parity: HF detectors, stock vs msda_tpu.

The reference repo's end-to-end demonstration swaps its Triton MSDA into a
pretrained Grounding DINO and shows identical detections on a COCO image
(/root/reference/README.md:25-34, assets/images/{torch,triton}_cats.png).

This is the quantitative analogue for this framework: HuggingFace's
``DeformableDetrForObjectDetection`` — and, matching the reference's
artifact exactly, ``GroundingDinoForObjectDetection`` — (torch CPU) runs
an image twice: once stock, once with its ``MultiScaleDeformableAttention``
kernel monkeypatched to call
:func:`msda_tpu.ops.multiscale_deformable_attention`; the script asserts
the logits/boxes agree and the ranked top-k detections are identical,
writing ``outputs/detection_parity.json``.

Pretrained weights are not fetchable in this offline environment, so the
models are *deterministically random-initialized* (documented deviation
from the reference's pretrained demo; the parity property being
demonstrated — the full detection pipeline produces the same boxes through
either kernel — is the same, and the op-boundary parity against HF's
module is covered quantitatively in tests/test_detection_parity.py).

Usage: python scripts/detection_parity.py [--impl auto|reference|pallas]
                                          [--model deformable-detr|grounding-dino]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("MSDA_FORCE_CPU") == "1":
    # outage escape hatch (same contract as tests/conftest.py): pin
    # jax to host CPU via the config route before any device access
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def build_model(num_labels=7, seed=0):
    import torch
    from transformers import (
        DeformableDetrConfig,
        DeformableDetrForObjectDetection,
        ResNetConfig,
    )

    bb = ResNetConfig(
        num_channels=3, embedding_size=16,
        hidden_sizes=[16, 32, 64, 128], depths=[1, 1, 1, 1],
        out_features=["stage2", "stage3", "stage4"],
    )
    cfg = DeformableDetrConfig(
        d_model=64, encoder_layers=2, decoder_layers=2, num_queries=16,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        encoder_attention_heads=4, decoder_attention_heads=4,
        num_feature_levels=4, use_pretrained_backbone=False,
        use_timm_backbone=False, backbone=None, backbone_config=bb,
        num_labels=num_labels,
    )
    torch.manual_seed(seed)
    return DeformableDetrForObjectDetection(cfg).eval()


def build_grounding_dino(seed=0):
    """A small random-init Grounding DINO (Swin backbone + BERT text
    encoder), the model family of the reference's own parity artifact."""
    import torch
    from transformers import (
        BertConfig,
        GroundingDinoConfig,
        GroundingDinoForObjectDetection,
    )
    from transformers.models.swin.configuration_swin import SwinConfig

    text_cfg = BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64,
    )
    bb = SwinConfig(
        image_size=128, patch_size=4, embed_dim=16, depths=[1, 1, 1],
        num_heads=[1, 2, 4], out_features=["stage1", "stage2", "stage3"],
        window_size=4,
    )
    cfg = GroundingDinoConfig(
        backbone_config=bb, text_config=text_cfg.to_dict(),
        d_model=64, encoder_layers=1, decoder_layers=1, num_queries=16,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        encoder_attention_heads=4, decoder_attention_heads=4,
        num_feature_levels=4,
    )
    torch.manual_seed(seed)
    return GroundingDinoForObjectDetection(cfg).eval()


_PRETRAINED_IDS = {
    "deformable-detr": "SenseTime/deformable-detr",
    "grounding-dino": "IDEA-Research/grounding-dino-tiny",
}


def probe_pretrained(model_name):
    """Try to load a real checkpoint from the local HF cache (offline).

    The reference's flagship artifact uses pretrained Grounding DINO
    weights (/root/reference/README.md:25-34).  This environment has no
    network egress, so the only way to close that gap is a checkpoint
    already sitting in the local HuggingFace cache; probe it every run so
    the demo automatically upgrades to pretrained weights the moment a
    cache appears.  Returns ``(model_or_None, probe_record)``.
    """
    import torch
    from transformers import (
        DeformableDetrForObjectDetection,
        GroundingDinoForObjectDetection,
    )

    repo = _PRETRAINED_IDS[model_name]
    cls = (GroundingDinoForObjectDetection if model_name == "grounding-dino"
           else DeformableDetrForObjectDetection)
    cache = os.environ.get(
        "HF_HOME", os.path.expanduser("~/.cache/huggingface"))
    record = {"repo": repo, "hf_cache": cache,
              "hf_cache_exists": os.path.isdir(cache)}
    try:
        model = cls.from_pretrained(repo, local_files_only=True)
        record["loaded"] = True
        return model.eval(), record
    except Exception as e:  # noqa: BLE001 — record whatever blocked it
        record["loaded"] = False
        record["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        return None, record


_MSDA_JIT_CACHE = {}


def _msda_jitted(impl, shapes_key):
    """One jitted wrapper per (impl, pyramid): eager dispatch of the op's
    many primitives is pathologically slow (per-op overhead; minutes for a
    single model forward on CPU), while the jitted op runs in ms."""
    import jax

    from msda_tpu.ops import multiscale_deformable_attention

    key = (impl, shapes_key)
    if key not in _MSDA_JIT_CACHE:
        shapes = np.asarray(shapes_key, np.int32)

        @jax.jit
        def f(value, loc, aw):
            return multiscale_deformable_attention(
                value, shapes, loc, aw, "zeros", False, impl=impl)

        _MSDA_JIT_CACHE[key] = f
    return _MSDA_JIT_CACHE[key]


def patched_msda_forward(impl):
    """A drop-in replacement for HF's MultiScaleDeformableAttention.forward
    that routes the op through msda_tpu (HF semantics are exactly
    padding_mode='zeros', align_corners=False — modeling_deformable_detr
    grid_sample call)."""
    import torch

    def forward(self, value, value_spatial_shapes,
                value_spatial_shapes_list, level_start_index,
                sampling_locations, attention_weights, im2col_step):
        import jax.numpy as jnp

        shapes_key = tuple(
            (int(h), int(w)) for h, w in value_spatial_shapes_list)
        out = _msda_jitted(impl, shapes_key)(
            jnp.asarray(value.detach().cpu().numpy()),
            jnp.asarray(sampling_locations.detach().cpu().numpy()),
            jnp.asarray(attention_weights.detach().cpu().numpy()),
        )
        out = np.asarray(out)
        b, n, h, d = out.shape
        return torch.from_numpy(out.reshape(b, n, h * d))

    return forward


def run_parity(impl="auto", top_k=10, seed=0, model_name="deformable-detr"):
    import torch

    rng = np.random.default_rng(seed)
    image = torch.from_numpy(
        rng.standard_normal((1, 3, 128, 128)).astype(np.float32))
    pretrained, probe = probe_pretrained(model_name)
    if model_name == "grounding-dino":
        from transformers.models.grounding_dino import (
            modeling_grounding_dino as hf,
        )

        model = pretrained or build_grounding_dino(seed=seed)
        # a fixed tiny "caption": [CLS] t t t [SEP] over the toy vocab
        # (pretrained checkpoints use the real BERT vocab; these ids are
        # valid there too)
        kwargs = dict(input_ids=torch.tensor([[101, 7, 8, 9, 102]]))
    else:
        from transformers.models.deformable_detr import (
            modeling_deformable_detr as hf,
        )

        model = pretrained or build_model(seed=seed)
        kwargs = {}

    def detect():
        with torch.no_grad():
            out = model(pixel_values=image, **kwargs)
        logits = out.logits[0].numpy()        # [N, K]
        boxes = out.pred_boxes[0].numpy()     # [N, 4]
        scores = 1.0 / (1.0 + np.exp(-logits))
        flat = scores.ravel()
        order = np.argsort(-flat)[:top_k]
        k = logits.shape[1]
        return {
            "logits": logits,
            "boxes": boxes,
            "top_scores": flat[order],
            "top_queries": order // k,
            "top_labels": order % k,
        }

    stock_fwd = hf.MultiScaleDeformableAttention.forward
    stock = detect()
    try:
        hf.MultiScaleDeformableAttention.forward = patched_msda_forward(impl)
        patched = detect()
    finally:
        hf.MultiScaleDeformableAttention.forward = stock_fwd

    # Grounding DINO's contrastive text head emits -inf logits at masked
    # text positions by design; compare only finite entries and require
    # the finiteness pattern itself to match (sigmoid(-inf) = 0 keeps the
    # ranking comparison below well-defined either way).
    fin_s = np.isfinite(stock["logits"])
    fin_p = np.isfinite(patched["logits"])
    assert np.array_equal(fin_s, fin_p), "finite-logit masks diverged"
    logits_diff = float(np.abs(
        stock["logits"][fin_s] - patched["logits"][fin_p]).max())
    boxes_diff = float(np.abs(stock["boxes"] - patched["boxes"]).max())
    same_rank = (
        np.array_equal(stock["top_queries"], patched["top_queries"])
        and np.array_equal(stock["top_labels"], patched["top_labels"])
    )
    scores_diff = float(np.abs(
        stock["top_scores"] - patched["top_scores"]).max())
    hf_cls = ("GroundingDinoForObjectDetection"
              if model_name == "grounding-dino"
              else "DeformableDetrForObjectDetection")
    if pretrained is not None:
        model_note = "hf %s (PRETRAINED: %s from local HF cache)" % (
            hf_cls, probe["repo"])
    else:
        model_note = (
            "hf %s (random init, seed=%d; pretrained weights not "
            "fetchable offline — documented deviation; local-cache "
            "probe result in 'pretrained_probe')" % (hf_cls, seed))
    return {
        "impl": impl,
        "model": model_note,
        "pretrained_probe": probe,
        "max_abs_logits_diff": logits_diff,
        "max_abs_boxes_diff": boxes_diff,
        "topk_detections_identical": bool(same_rank),
        "max_abs_topk_score_diff": scores_diff,
        "top_labels": [int(x) for x in stock["top_labels"]],
        "top_queries": [int(x) for x in stock["top_queries"]],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "reference", "fused", "pallas"])
    ap.add_argument("--model", default="deformable-detr",
                    choices=["deformable-detr", "grounding-dino"])
    ap.add_argument("--out", default="outputs/detection_parity.json")
    args = ap.parse_args()

    res = run_parity(impl=args.impl, model_name=args.model)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))
    assert res["topk_detections_identical"], "top-k detections diverged!"
    assert res["max_abs_boxes_diff"] < 1e-3, res["max_abs_boxes_diff"]
    print(f"PARITY OK -> {args.out}")


if __name__ == "__main__":
    main()
