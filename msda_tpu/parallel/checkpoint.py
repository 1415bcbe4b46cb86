"""Checkpoint / resume for MSDA training state (orbax-backed).

The reference has no checkpoint code — its capability bar is "nn.Module
state-dict for free" (SURVEY §5; the three Linears at reference
frontend.py:218-220).  Flax params are already a serializable pytree, which
matches that bar; this module adds the production piece on top: atomic
on-disk checkpoints of the full train state (params + optimizer state +
step), with restore that works across device topologies (restored arrays
are committed to the target mesh's shardings).

Usage:
    ckpt = TrainCheckpointer(dir)
    ckpt.save(step, params, opt_state)
    step, params, opt_state = ckpt.restore(params, opt_state)
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

__all__ = ["TrainCheckpointer"]


class TrainCheckpointer:
    """Atomic train-state checkpoints with latest-step resume.

    Thin, dependency-gated wrapper over orbax ``StandardCheckpointer``:
    each ``save`` writes ``{dir}/{step}`` atomically (orbax's tmp+rename
    protocol, safe against partial writes on crash); ``restore`` picks the
    latest step by default and re-shards every array onto the shardings of
    the provided templates (so a checkpoint taken on one mesh restores
    onto another — the state is resharded by GSPMD on first use).
    """

    def __init__(self, directory: str | os.PathLike):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(os.fspath(directory))
        os.makedirs(self._dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def steps(self) -> list[int]:
        """Available checkpoint steps, ascending."""
        out = []
        for name in os.listdir(self._dir):
            path = os.path.join(self._dir, name)
            if name.isdigit() and os.path.isdir(path):
                out.append(int(name))
        return sorted(out)

    def save(self, step: int, params: Any, opt_state: Any) -> str:
        """Write an atomic checkpoint for ``step``; returns its path."""
        path = os.path.join(self._dir, str(int(step)))
        state = {
            "step": np.asarray(int(step), np.int64),
            "params": params,
            "opt_state": opt_state,
        }
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, params_template: Any, opt_state_template: Any,
                step: int | None = None):
        """Restore (step, params, opt_state).

        ``params_template`` / ``opt_state_template`` supply the tree
        structure, dtypes and shardings to restore onto (pass the
        freshly-initialized state).  ``step=None`` restores the latest.
        """
        if step is None:
            steps = self.steps()
            if not steps:
                raise FileNotFoundError(
                    f"no checkpoints under {self._dir}"
                )
            step = steps[-1]
        path = os.path.join(self._dir, str(int(step)))
        template = {
            "step": np.asarray(0, np.int64),
            "params": params_template,
            "opt_state": opt_state_template,
        }

        def _abstract(x):
            return jax.ShapeDtypeStruct(
                np.shape(x),
                x.dtype if hasattr(x, "dtype") else np.asarray(x).dtype,
                sharding=getattr(x, "sharding", None),
            )

        abstract = jax.tree.map(_abstract, template)
        state = self._ckptr.restore(path, abstract)
        return int(state["step"]), state["params"], state["opt_state"]
