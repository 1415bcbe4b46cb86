"""Model components built on the MSDA op."""

from .attention import MultiscaleDeformableAttention
from .convert import (
    attention_params_from_hf,
    attention_params_from_torch,
    attention_params_to_torch,
)
from .detr import DeformableDetr, postprocess

__all__ = [
    "MultiscaleDeformableAttention",
    "DeformableDetr",
    "postprocess",
    "attention_params_from_hf",
    "attention_params_from_torch",
    "attention_params_to_torch",
]
