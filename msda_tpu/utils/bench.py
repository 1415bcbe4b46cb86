"""Benchmarking utilities (analogue of triton.testing.do_bench used by
/root/reference/scripts/benchmark.py:52-54).

TPU-specific reality: per-call dispatch latency (especially through remote
device tunnels) can dwarf kernel time, and runtimes may dedupe identical
idempotent calls.  ``timeit_op`` therefore measures by running the op ``n``
times inside a single jitted ``lax.scan`` with a data-dependent carry, then
forcing completion with a host transfer — this yields true device time per
iteration without per-call dispatch overhead.
"""

from __future__ import annotations

import time
from typing import Callable

import jax

__all__ = ["timeit_op", "device_memory_stats", "reference_workload"]

#: the reference benchmark pyramid (reference scripts/benchmark.py:24-31)
REFERENCE_SHAPES = ((64, 64), (32, 32), (16, 16), (8, 8))


def reference_workload(num_queries=10000, dtype=None, shapes=None, seed=0,
                       batch=4, heads=8, channels=32, points=4):
    """Construct the reference benchmark workload (one definition for
    bench.py, scripts/benchmark.py, autotune.py, memory_report.py and
    capture_trace.py — the headline config must mean the same tensors
    everywhere).

    Returns ``(img, shapes, pts, wts, og)`` with ``shapes`` an int32
    ``[L, 2]`` numpy array; defaults are the reference's headline point
    (B=4, H=8, C=32, P=4, 4-level 64x64 pyramid —
    reference scripts/benchmark.py:24-31).
    """
    import jax.numpy as jnp
    import numpy as np

    dtype = jnp.float32 if dtype is None else jnp.dtype(dtype)
    shapes = np.asarray(
        REFERENCE_SHAPES if shapes is None else shapes, np.int32)
    B, H, C, P, L = batch, heads, channels, points, len(shapes)
    I = int((shapes[:, 0] * shapes[:, 1]).sum())  # noqa: E741
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    img = jax.random.normal(k1, (B, I, H, C), dtype)
    pts = jax.random.uniform(k2, (B, num_queries, H, L, P, 2), dtype)
    wts = jax.nn.softmax(
        jax.random.normal(k3, (B, num_queries, H, L, P), dtype), -1)
    og = jax.random.uniform(k4, (B, num_queries, H, C), dtype)
    return img, shapes, pts, wts, og


def timeit_op(
    step: Callable,
    init_carry,
    n: int = 50,
    repeats: int = 3,
    warmup: bool = True,
):
    """Median seconds/iteration of ``carry -> carry`` ``step`` on device.

    ``step`` must be a pure function whose output depends on its input
    (a data-dependent chain), so iterations cannot be elided or overlapped
    into nothing by the compiler/runtime.

    Methodology: the scan is timed at two lengths (``n`` and ``n // 3``)
    and the per-iteration time is the SLOPE ``(T_n - T_n3) / (n - n3)``.
    A single-length ``T_n / n`` folds a fixed ~40 ms per-call overhead
    (dispatch, input/output staging through the remote device tunnel) into
    the per-iteration figure; the slope cancels every cost that does not
    scale with the iteration count.  Completion is forced by blocking on
    EVERY output buffer: forcing only the first leaf is not enough — a
    loop-invariant pass-through carry can alias an input copy whose buffer
    becomes ready before the scan finishes (measured on this runtime).
    """
    if n < 2:
        raise ValueError("timeit_op needs n >= 2 for the slope measurement")
    if repeats < 1:
        raise ValueError("timeit_op needs repeats >= 1")
    n3 = max(1, n // 3)

    def make_run(length):
        @jax.jit
        def run(carry):
            carry, _ = jax.lax.scan(
                lambda c, _: (step(c), None), carry, None, length=length)
            return carry
        return run

    run_n, run_n3 = make_run(n), make_run(n3)

    def force(c):
        jax.block_until_ready(c)
        _ = jax.tree.leaves(c)[-1].ravel()[0].item()

    def timed(run):
        t0 = time.perf_counter()
        force(run(init_carry))
        return time.perf_counter() - t0

    if warmup:
        force(run_n(init_carry))
        force(run_n3(init_carry))
    tn, tn3 = [], []
    for _ in range(repeats):
        tn.append(timed(run_n))
        tn3.append(timed(run_n3))
    tn.sort()
    tn3.sort()
    return (tn[len(tn) // 2] - tn3[len(tn3) // 2]) / (n - n3)


def device_memory_stats(device=None):
    """Best-effort live/peak device memory in bytes (TPU analogue of
    torch.cuda.max_memory_allocated used at
    /root/reference/scripts/benchmark.py:163-172)."""
    if device is None:
        device = jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return {}
    if not stats:  # some runtimes return None instead of raising
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
