"""Operator library: the multiscale deformable attention op and its kernels."""

from .msda import multiscale_deformable_attention
from .reference import (
    native_multiscale_deformable_attention,
    compute_level_data,
)

__all__ = [
    "multiscale_deformable_attention",
    "native_multiscale_deformable_attention",
    "compute_level_data",
]
