"""Test configuration.

Must run before jax initializes: forces 8 virtual CPU host devices so the
multi-chip sharding tests (tests/test_sharding.py) can build an 8-device mesh
on any machine, with or without real TPUs attached.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Outage escape hatch: MSDA_FORCE_CPU=1 pins jax to host CPU via the config
# route — the only pin that works on this machine (the axon TPU plugin
# ignores the JAX_PLATFORMS env var, and a dead TPU tunnel makes ANY backend
# enumeration — even jax.devices("cpu") or has_tpu() below — hang on attach).
if os.environ.get("MSDA_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

# f64 support for the interpreter-path tests (runs on CPU devices only; the
# reference test suite covers torch.float64 the same way —
# /root/reference/tests/test_msda.py:65-72).
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite's wall time is dominated by
# distinct jit/Pallas compiles (~15-25 s each through this machine's remote
# TPU compile helper).  With a warm cache the full suite drops from ~13 min
# to a few minutes; the cache key covers HLO + compile options + runtime
# version, so stale hits are not a correctness risk.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "MSDA_TPU_JAX_CACHE",
        os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


def has_tpu() -> bool:
    try:
        return len(jax.devices("tpu")) > 0
    except RuntimeError:
        return False


requires_tpu = pytest.mark.skipif(not has_tpu(), reason="no TPU available")

# Oracle-placement escape hatch: MSDA_ORACLE_DEVICE=cpu routes the
# reference-interpreter oracle evaluations (impl="reference") onto the host
# CPU backend while the Pallas kernels under test still run on the TPU.
# Motivation: this machine's TPU tunnel has an intermittent outage family in
# which XLA *gather* execution hangs indefinitely (observed 2026-08-20/21:
# every jnp.take probe hung, while matmuls and Mosaic kernels ran fine).
# The reference impl is gather-based (ops/reference.py:140-150), so with the
# outage active every pallas-vs-reference TPU test would hang on its oracle
# half.  The oracle's semantics are backend-independent (pure jnp, f32), so
# CPU placement changes nothing about what is asserted — only where the
# known-good side happens to be computed.
_ORACLE_DEVICE = os.environ.get("MSDA_ORACLE_DEVICE", "")


def oracle_device():
    """Context manager placing oracle computation per MSDA_ORACLE_DEVICE.

    Default (env unset): a no-op — the oracle runs wherever the test runs.
    Uncommitted input arrays (plain numpy, or ``jnp.asarray`` results made
    outside any placement context) follow ``jax.default_device``, so call
    sites only need to wrap the oracle evaluation itself.
    """
    import contextlib

    if not _ORACLE_DEVICE:
        return contextlib.nullcontext()
    return jax.default_device(jax.devices(_ORACLE_DEVICE)[0])


@pytest.fixture(scope="session")
def cpu_device():
    return jax.devices("cpu")[0]


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
