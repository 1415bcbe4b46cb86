"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

The conftest forces --xla_force_host_platform_device_count=8, so these run
on any machine.  Verifies that the sharded op matches the single-device op
bitwise and that a full sharded train step executes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msda_tpu.parallel import (
    make_mesh,
    shard_msda_args,
    sharded_multiscale_deformable_attention,
)
from msda_tpu.ops import multiscale_deformable_attention
from utils import get_functional_data


@pytest.fixture(scope="module")
def mesh(cpu_devices):
    if len(cpu_devices) < 8:
        pytest.skip("need 8 virtual CPU devices")
    return make_mesh({"dp": 2, "sp": 2, "tp": 2}, cpu_devices)


def test_sharded_op_matches_single_device(mesh):
    img, shapes, pts, wts, _ = get_functional_data(B=2, H=4, N=64, oob=True)
    shapes_j = jnp.asarray(shapes)

    with jax.default_device(jax.devices("cpu")[0]):
        want = np.asarray(
            multiscale_deformable_attention(
                img, shapes_j, pts, wts, "border", False, impl="reference"
            )
        )

    img_s, shapes_s, pts_s, wts_s = shard_msda_args(
        mesh, jnp.asarray(img), shapes_j, jnp.asarray(pts), jnp.asarray(wts)
    )
    with mesh:
        f = jax.jit(
            lambda i, s, p, w: sharded_multiscale_deformable_attention(
                mesh, i, s, p, w, "border", False, impl="reference"
            )
        )
        got = np.asarray(f(img_s, shapes_s, pts_s, wts_s))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_sharded_op_is_actually_sharded(mesh):
    """The output must be distributed over the mesh, not replicated."""
    img, shapes, pts, wts, _ = get_functional_data(B=2, H=4, N=64)
    img_s, shapes_s, pts_s, wts_s = shard_msda_args(
        mesh, jnp.asarray(img), jnp.asarray(shapes), jnp.asarray(pts),
        jnp.asarray(wts),
    )
    with mesh:
        out = jax.jit(
            lambda i, s, p, w: sharded_multiscale_deformable_attention(
                mesh, i, s, p, w, "border", False, impl="reference"
            )
        )(img_s, shapes_s, pts_s, wts_s)
    # sharded over dp x sp x tp = 8 ways -> each shard is 1/8 of the output
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert len(out.addressable_shards) == 8
    assert shard_shapes == {(1, 32, 2, 32)}


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip dry run must work on the CPU mesh."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    n = min(8, len(jax.devices("cpu")))
    if jax.default_backend() != "cpu":
        pytest.skip("dryrun uses default-backend devices; covered by driver")
    mod.dryrun_multichip(n)
