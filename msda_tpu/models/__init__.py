"""Model components built on the MSDA op."""

from .attention import MultiscaleDeformableAttention
from .detr import DeformableDetr, postprocess

__all__ = ["MultiscaleDeformableAttention", "DeformableDetr", "postprocess"]
