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
import jax.numpy as jnp

__all__ = ["timeit_op", "device_memory_stats"]


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
    """

    @jax.jit
    def run(carry):
        carry, _ = jax.lax.scan(lambda c, _: (step(c), None), carry, None, length=n)
        return carry

    if warmup:
        c = run(init_carry)
        _ = jax.tree.leaves(c)[0].ravel()[0].item()  # force completion
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        c = run(init_carry)
        _ = jax.tree.leaves(c)[0].ravel()[0].item()
        times.append((time.perf_counter() - t0) / n)
    times.sort()
    return times[len(times) // 2]


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
