"""Profiler trace capture produces a loadable trace directory."""

import os

import jax
import jax.numpy as jnp
import pytest

from msda_tpu.utils import annotate, trace


@pytest.mark.skipif(
    os.environ.get("MSDA_TPU_PROFILE_TEST", "") != "1",
    reason="profiler start/stop attaches to the TPU backend, which takes "
    "minutes through this machine's remote device tunnel; set "
    "MSDA_TPU_PROFILE_TEST=1 to run",
)
def test_trace_capture(tmp_path, cpu_device):
    d = tmp_path / "trace"
    with jax.default_device(cpu_device):
        with trace(d):
            with annotate("matmul"):
                x = jnp.ones((64, 64))
                y = jax.jit(lambda a: a @ a)(x)
        y.block_until_ready()
    # a trace run produces plugins/profile/<run>/...{trace.json.gz,xplane.pb}
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert any("xplane" in f or "trace" in f for f in found), found
