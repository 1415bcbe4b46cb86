"""Model components built on the MSDA op."""

from .attention import MultiscaleDeformableAttention

__all__ = ["MultiscaleDeformableAttention"]
