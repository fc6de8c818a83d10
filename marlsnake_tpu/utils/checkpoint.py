"""Checkpoint/restore of full training state via orbax.

The reference has three ad-hoc schemes (SURVEY.md §5): torch ``save/load``
of net+optimizer+epsilon (train_dqn.py:356-383), an atomic pickle for the
NEAT hybrid (train_ga.py:45-57), and the lost PPO's
``{model,optimizer,epoch}``. None can resume mid-episode. Here ANY PyTree
— including live env states and PRNG keys — checkpoints through one
orbax-backed API, so training resumes exactly where it stopped, env
states included.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _pack_zero_size(tree: Any) -> Any:
    """Orbax refuses zero-size arrays; swap them for a 1-byte sentinel
    (e.g. the engine's frame_stack=1 obs_stack placeholder)."""
    return jax.tree.map(
        lambda x: np.zeros((1,), np.uint8)
        if getattr(x, 'size', 1) == 0 else x, tree)


def _unpack_zero_size(restored: Any, template: Any) -> Any:
    import jax.numpy as jnp
    return jax.tree.map(
        lambda r, t: jnp.zeros(t.shape, t.dtype)
        if getattr(t, 'size', 1) == 0 else r, restored, template)


def save(path: str, payload: Any, force: bool = True) -> None:
    """Synchronous checkpoint of an arbitrary PyTree."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _pack_zero_size(jax.device_get(payload)), force=force)
    ckptr.wait_until_finished()


def restore(path: str, template: Any) -> Any:
    """Restore a PyTree saved with :func:`save`. ``template`` provides the
    structure/shapes/dtypes (e.g. a freshly-initialized state)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        path, _pack_zero_size(jax.device_get(template)))
    return _unpack_zero_size(restored, template)


class AsyncCheckpointer:
    """Async checkpoint writer: training continues while the previous
    snapshot flushes to disk."""

    def __init__(self):
        import orbax.checkpoint as ocp
        self._ckptr = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())

    def save(self, path: str, payload: Any, force: bool = True) -> None:
        self._ckptr.save(os.path.abspath(path),
                         _pack_zero_size(jax.device_get(payload)),
                         force=force)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.close()
