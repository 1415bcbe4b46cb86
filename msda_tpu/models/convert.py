"""Weight migration from the reference torch module.

A user of the reference library holds a torch ``state_dict`` for its
``MultiscaleDeformableAttention`` module — three ``nn.Linear`` layers
named ``img_input_proj`` / ``query_input_proj`` / ``query_output_proj``
(/root/reference/src/msda_triton/frontend.py:218-220).  This converts
that state into parameters for this package's flax module
(models/attention.py), which mirrors the reference layout exactly, so a
trained reference module drops into the TPU stack unchanged.

Convention: torch ``nn.Linear`` stores ``weight [out, in]`` /
``bias [out]``; flax ``nn.Dense`` stores ``kernel [in, out]`` /
``bias [out]`` — the kernel is the transposed weight.

Inputs may be torch tensors, numpy arrays, or anything ``np.asarray``
accepts (torch is NOT imported here — no runtime torch dependency).
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

__all__ = [
    "attention_params_from_torch",
    "attention_params_to_torch",
    "attention_params_from_hf",
]

_PROJS = ("img_input_proj", "query_input_proj", "query_output_proj")


def _to_np(x):
    if hasattr(x, "detach"):  # torch tensor, without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def attention_params_from_torch(
    state_dict: Mapping[str, object], prefix: str = "", dtype=jnp.float32
):
    """torch ``MultiscaleDeformableAttention.state_dict()`` -> flax params.

    ``prefix`` selects a submodule inside a larger state_dict (e.g.
    ``"decoder.layers.0.cross_attn."`` — must include the trailing dot).
    Returns ``{"params": {...}}`` ready for
    ``MultiscaleDeformableAttention.apply``.
    """
    params = {}
    for name in _PROJS:
        wk, bk = f"{prefix}{name}.weight", f"{prefix}{name}.bias"
        missing = [k for k in (wk, bk) if k not in state_dict]
        if missing:
            raise KeyError(
                f"state_dict is missing {missing}; available keys with this "
                f"prefix: {[k for k in state_dict if k.startswith(prefix)][:8]}"
            )
        w = _to_np(state_dict[wk])
        b = _to_np(state_dict[bk])
        if w.ndim != 2 or b.ndim != 1 or w.shape[0] != b.shape[0]:
            raise ValueError(
                f"{name}: expected weight [out, in] and bias [out], got "
                f"{w.shape} / {b.shape}"
            )
        params[name] = {
            "kernel": jnp.asarray(w.T, dtype),
            "bias": jnp.asarray(b, dtype),
        }
    return {"params": params}


def attention_params_from_hf(
    state_dict: Mapping[str, object],
    num_heads: int,
    num_levels: int,
    num_points: int,
    prefix: str = "",
    dtype=jnp.float32,
):
    """HuggingFace ``DeformableDetrMultiscaleDeformableAttention`` weights
    -> flax params — the migration path for *pretrained* HF detectors
    (Deformable DETR / Grounding DINO share this module).

    HF parameterizes the query projection as two separate Linears
    (``sampling_offsets`` -> [H*L*P*2], ``attention_weights`` ->
    [H*L*P]); this package fuses them into one ``query_input_proj`` ->
    [H*L*P*3] whose reshape slots are (x-offset, y-offset, weight logit)
    per (head, level, point) — so the HF rows are interleaved into the
    fused layout here.  ``value_proj`` maps to ``img_input_proj`` and
    ``output_proj`` to ``query_output_proj``.

    Use the resulting params with a module configured to HF semantics:
    ``offset_normalizer="detr"`` (original (w, h) order),
    ``padding_mode="zeros"``, ``align_corners=False``.

    ``prefix`` selects the attention submodule inside a full model
    state_dict (e.g. ``"model.decoder.layers.0.encoder_attn."``).
    """
    H, L, P = int(num_heads), int(num_levels), int(num_points)

    def np_pair(name):
        wk, bk = f"{prefix}{name}.weight", f"{prefix}{name}.bias"
        missing = [k for k in (wk, bk) if k not in state_dict]
        if missing:
            raise KeyError(
                f"state_dict is missing {missing}; keys with this prefix: "
                f"{[k for k in state_dict if k.startswith(prefix)][:8]}"
            )
        return _to_np(state_dict[wk]), _to_np(state_dict[bk])

    off_w, off_b = np_pair("sampling_offsets")    # [H*L*P*2, emb]
    attn_w, attn_b = np_pair("attention_weights")  # [H*L*P, emb]
    val_w, val_b = np_pair("value_proj")
    out_w, out_b = np_pair("output_proj")
    emb = off_w.shape[1]
    if off_w.shape[0] != H * L * P * 2 or attn_w.shape[0] != H * L * P:
        raise ValueError(
            f"weight rows {off_w.shape[0]}/{attn_w.shape[0]} do not match "
            f"num_heads*num_levels*num_points = {H}*{L}*{P}"
        )

    # interleave HF's (offsets, logit) rows into the fused 3-slot layout:
    # fused row ((h*L+l)*P+p)*3 + {0,1} = offsets, + 2 = weight logit
    wq = np.concatenate(
        [off_w.reshape(H * L * P, 2, emb), attn_w.reshape(H * L * P, 1, emb)],
        axis=1,
    ).reshape(H * L * P * 3, emb)
    bq = np.concatenate(
        [off_b.reshape(H * L * P, 2), attn_b.reshape(H * L * P, 1)], axis=1
    ).reshape(H * L * P * 3)

    def dense(w, b):
        return {"kernel": jnp.asarray(w.T, dtype), "bias": jnp.asarray(b, dtype)}

    return {"params": {
        "img_input_proj": dense(val_w, val_b),
        "query_input_proj": dense(wq, bq),
        "query_output_proj": dense(out_w, out_b),
    }}


def attention_params_to_torch(params) -> dict:
    """Inverse of :func:`attention_params_from_torch`: flax params ->
    a numpy state_dict in the reference's torch naming/layout."""
    inner = params.get("params", params)
    out = {}
    for name in _PROJS:
        if name not in inner:
            raise KeyError(f"flax params missing {name!r}")
        out[f"{name}.weight"] = np.asarray(inner[name]["kernel"]).T.copy()
        out[f"{name}.bias"] = np.asarray(inner[name]["bias"]).copy()
    return out
