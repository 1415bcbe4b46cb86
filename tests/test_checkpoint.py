"""Checkpoint/resume roundtrip for the sharded train state.

The reference's capability bar is "module params are a state-dict for
free" (SURVEY §5); this exceeds it with atomic on-disk train-state
checkpoints (params + optimizer + step) that restore across meshes.
Runs fully on the 8-virtual-CPU mesh from conftest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from msda_tpu.parallel import (
    TrainCheckpointer, make_mesh, replicate_params,
)


def _tiny_state(seed=0):
    import flax.linen as nn

    model = nn.Dense(8)
    x = jnp.asarray(np.random.default_rng(seed).random((4, 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), x)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    return model, tx, x, params, opt_state


def test_checkpoint_roundtrip(tmp_path, cpu_devices):
    cpu = cpu_devices[0]
    with jax.default_device(cpu):
        model, tx, x, params, opt_state = _tiny_state()

        @jax.jit
        def step_fn(params, opt_state, x):
            loss, grads = jax.value_and_grad(
                lambda p: jnp.mean(model.apply(p, x) ** 2)
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(3):
            params, opt_state, _ = step_fn(params, opt_state, x)

        ckpt = TrainCheckpointer(tmp_path / "ckpts")
        ckpt.save(3, params, opt_state)
        assert ckpt.steps() == [3]

        # fresh state restores to the trained one
        _, _, _, params0, opt_state0 = _tiny_state(seed=1)
        step, params_r, opt_r = ckpt.restore(params0, opt_state0)
    assert step == 3
    for a, b in zip(jax.tree.leaves(params_r), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_r), jax.tree.leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_restore_onto_mesh(tmp_path, cpu_devices):
    """A checkpoint saved from single-device state restores onto a mesh
    with the templates' shardings applied."""
    if len(cpu_devices) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    cpu = cpu_devices[0]
    with jax.default_device(cpu):
        model, tx, x, params, opt_state = _tiny_state()
        ckpt = TrainCheckpointer(tmp_path / "ckpts")
        ckpt.save(7, params, opt_state)

        mesh = make_mesh({"dp": 2, "sp": 1, "tp": 2}, cpu_devices[:4])
        params_t = replicate_params(params, mesh)
        opt_t = replicate_params(opt_state, mesh)
        step, params_r, opt_r = ckpt.restore(params_t, opt_t)
    assert step == 7
    for a, b in zip(jax.tree.leaves(params_r), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # restored arrays carry the mesh sharding of the template
    shardings = {
        type(l.sharding).__name__ for l in jax.tree.leaves(params_r)
        if hasattr(l, "sharding")
    }
    assert "NamedSharding" in shardings, shardings


def test_checkpoint_latest_and_missing(tmp_path):
    ckpt = TrainCheckpointer(tmp_path / "empty")
    with pytest.raises(FileNotFoundError):
        ckpt.restore(None, None)
