"""Profiling helpers: capture XLA/TPU traces around a code region.

The reference's only perf tooling is ``triton.testing.do_bench`` timing
(scripts/benchmark.py:52-54); the TPU-native equivalents here are
``timeit_op`` (bench.py — in-jit scan timing) plus this module for *trace*
capture: a context manager around ``jax.profiler`` producing a
TensorBoard-loadable trace directory with device (TPU) timelines, XLA op
breakdown and HLO metadata.
"""

from __future__ import annotations

import contextlib
import os

import jax

__all__ = ["trace", "annotate"]


def _all_devices():
    """Devices of every *initialized* backend, not just the default
    platform.  Uses only platforms that are already up — probing new
    backends inside the drain could itself hang (e.g. a TPU tunnel)."""
    devices = []
    try:
        backends = jax.extend.backend.backends()  # name -> client
    except Exception:
        return jax.devices()
    for name in backends:
        try:
            devices.extend(jax.devices(name))
        except RuntimeError:
            continue
    return devices or jax.devices()


@contextlib.contextmanager
def trace(log_dir: str | os.PathLike, *, block: bool = True):
    """Capture a profiler trace of the enclosed region.

    with msda_tpu.utils.trace("/tmp/msda_trace"):
        out = step(batch)                # traced
    # -> tensorboard --logdir /tmp/msda_trace  (Profile tab)

    ``block=True`` (default) waits for all in-flight device work before
    closing the trace so async dispatches are fully captured.
    """
    log_dir = os.fspath(log_dir)
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        if block:
            # drain: block on a dummy transfer to every device of every
            # initialized backend (jax.devices() alone only covers the
            # default platform, missing e.g. CPU work dispatched under
            # jax.default_device while TPU is the default backend)
            for dev in _all_devices():
                jax.device_put(0.0, dev).block_until_ready()
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside a :func:`trace` capture (shows up as a
    labeled span on the profiler timeline).

    with msda_tpu.utils.trace(dir):
        with msda_tpu.utils.annotate("forward"):
            out = fwd(x)
    """
    return jax.profiler.TraceAnnotation(name)
