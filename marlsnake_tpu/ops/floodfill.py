"""Bounded flood-fill (reachable-space count) as masked dilation.

On-device replacement for the reference's Python BFS with a visit cap
(``count_reachable_space``, train_dqn.py:444-461). The reference's
count-limited BFS returns exactly ``min(|reachable region|, limit)`` (it
only stops early once ``limit`` cells have been popped), and ``limit``
iterations of 4-neighbor dilation visit at least ``min(limit, |region|)``
cells, so capping the dilation count reproduces the BFS result exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dilate(v: jnp.ndarray) -> jnp.ndarray:
    up = jnp.pad(v[1:], ((0, 1), (0, 0)))
    down = jnp.pad(v[:-1], ((1, 0), (0, 0)))
    left = jnp.pad(v[:, 1:], ((0, 0), (0, 1)))
    right = jnp.pad(v[:, :-1], ((0, 0), (1, 0)))
    return v | up | down | left | right


def reachable_count(passable: jnp.ndarray, start: jnp.ndarray,
                    limit: int = 60) -> jnp.ndarray:
    """Count cells reachable from ``start`` through ``passable``, capped.

    ``start`` is always counted (the reference seeds its visited set with
    the start cell regardless of passability). Returns int32.
    """
    h, w = passable.shape
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    seed = (rows == start[0]) & (cols == start[1])

    def body(_, vis):
        return vis | (_dilate(vis) & passable)

    vis = jax.lax.fori_loop(0, limit, body, seed)
    return jnp.minimum(vis.sum().astype(jnp.int32), limit)
