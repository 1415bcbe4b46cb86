"""msda_tpu — TPU-native multiscale deformable attention framework.

A from-scratch JAX / Pallas / XLA implementation of the capabilities of the
``msda-triton`` reference library (multiscale deformable attention from
Deformable DETR, arXiv:2010.04159): a differentiable functional op, a
module with input/output projections, an interpreter fallback, parallelism
helpers, tests and benchmarks — designed TPU-first rather than translated
from the CUDA/Triton implementation.

Public API (parity with /root/reference/src/msda_triton/__init__.py:1-10):
    multiscale_deformable_attention      — differentiable functional op
    native_multiscale_deformable_attention — pure-jnp interpreter path
    MultiscaleDeformableAttention        — flax module with projections
"""

from .ops import (
    multiscale_deformable_attention,
    native_multiscale_deformable_attention,
    compute_level_data,
)
from .models import MultiscaleDeformableAttention

# installed-package metadata when available (the reference's mechanism,
# __init__.py:5), falling back for in-tree use without installation; both
# routes resolve to _version.py (pyproject reads it via hatch's
# dynamic-version hook), so there is one source of truth
try:
    from importlib.metadata import version as _pkg_version

    __version__ = _pkg_version("msda-tpu")
except Exception:
    from ._version import __version__

__all__ = [
    "multiscale_deformable_attention",
    "native_multiscale_deformable_attention",
    "compute_level_data",
    "MultiscaleDeformableAttention",
    "__version__",
]
