"""Ahead-of-time export for serving (jax.export wrappers).

A deployed detector should not re-trace/re-compile Python at serving
time: ``jax.export`` lowers a jitted function to serialized StableHLO
that a serving process (same or different host) deserializes and calls
directly.  The reference library has no serving story (SURVEY §5); this
is part of this framework's production extension.

Platform note: the exported artifact embeds code for the platform(s) the
function was lowered for (the jit backend by default).  The pure-XLA
impls ("reference"/"fused") export portably; the Pallas kernels lower to
TPU custom calls, so export them from a TPU process for TPU serving.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["export_fn", "load_exported", "save_exported", "load_exported_file"]


def _spec(x):
    return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))


def export_fn(fn, *example_args, platforms=None) -> bytes:
    """Serialize ``jit(fn)`` specialized to ``example_args``' shapes/dtypes.

    ``example_args`` may be arrays or ShapeDtypeStructs (any pytree of
    them); only shapes/dtypes are read.  ``platforms`` optionally lowers
    for an explicit platform list (e.g. ``("tpu",)``) instead of the
    current default backend.
    """
    specs = jax.tree.map(_spec, example_args)
    exp = jax.export.export(jax.jit(fn), platforms=platforms)(*specs)
    return exp.serialize()


def load_exported(blob: bytes):
    """Deserialize an :func:`export_fn` artifact into a callable."""
    return jax.export.deserialize(blob).call


def save_exported(blob: bytes, path: str | os.PathLike) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_exported_file(path: str | os.PathLike):
    with open(path, "rb") as f:
        return load_exported(f.read())
