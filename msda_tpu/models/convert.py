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

__all__ = ["attention_params_from_torch", "attention_params_to_torch"]

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
