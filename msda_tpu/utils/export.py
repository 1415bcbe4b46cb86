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
import threading
import warnings

import jax
import jax.numpy as jnp

__all__ = ["export_fn", "load_exported", "save_exported", "load_exported_file"]

# jax exposes jax_export_ignore_forward_compatibility only as a
# process-global config (no scoped context manager as of jax 0.9.0);
# serialize exports that flip it so a concurrent export from another
# thread can never be lowered with the flag unexpectedly set
_EXPORT_CONFIG_LOCK = threading.Lock()


def _spec(x):
    return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))


def export_fn(fn, *example_args, platforms=None,
              ignore_forward_compatibility=None) -> bytes:
    """Serialize ``jit(fn)`` specialized to ``example_args``' shapes/dtypes.

    ``example_args`` may be arrays or ShapeDtypeStructs (any pytree of
    them); only shapes/dtypes are read.  ``platforms`` optionally lowers
    for an explicit platform list (e.g. ``("tpu",)``) instead of the
    current default backend.

    ``ignore_forward_compatibility``: ``jax.export`` normally lowers
    custom calls through a forward-compatibility path so the artifact
    keeps loading on newer runtimes.  On this jax (0.9.0), that path
    mis-lowers Pallas TPU kernels when ``jax_enable_x64`` is on: index
    vectors inside the Mosaic payload widen to i64, which the TPU
    compiler rejects (``Check failed: bitwidth_ <= 32``) when the
    artifact is compiled — the normal (non-export) lowering of the same
    kernel is pure i32.  Default ``None`` auto-enables the flag exactly
    for that case (TPU target + x64 enabled) and emits a
    ``UserWarning``, since the artifact then loses the
    load-on-newer-runtime guarantee; pass ``False`` to force the
    forward-compatible lowering anyway, or ``True`` to skip it for any
    platform (e.g. same-process serving, where forward compatibility
    buys nothing).  Flipping the (process-global) flag is guarded by a
    module lock, so concurrent ``export_fn`` calls from other threads
    are serialized rather than lowered with the flag unexpectedly set.
    """
    specs = jax.tree.map(_spec, example_args)
    if ignore_forward_compatibility is None:
        targets = platforms or (jax.default_backend(),)
        ignore_forward_compatibility = (
            "tpu" in targets and jax.config.jax_enable_x64)
        if ignore_forward_compatibility:
            # the artifact loses the load-on-newer-runtime guarantee; a
            # serving pipeline exporting from an x64 process must hear
            # about it at the call site, not discover it at load time
            warnings.warn(
                "export_fn: disabling jax.export forward-compatible "
                "lowering (TPU target with jax_enable_x64 on — the "
                "compat path mis-lowers Pallas TPU kernels to i64 "
                "indices on this jax); the artifact may not load on "
                "newer runtimes. Pass ignore_forward_compatibility="
                "False to force the compat lowering.",
                stacklevel=2,
            )
    if ignore_forward_compatibility:
        with _EXPORT_CONFIG_LOCK:
            prev = jax.config.jax_export_ignore_forward_compatibility
            jax.config.update("jax_export_ignore_forward_compatibility", True)
            try:
                exp = jax.export.export(
                    jax.jit(fn), platforms=platforms)(*specs)
            finally:
                jax.config.update(
                    "jax_export_ignore_forward_compatibility", prev)
    else:
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
