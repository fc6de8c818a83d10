"""Ray-feature observation transform (GraphSnakeEnv equivalent).

Vectorized re-design of the reference's per-snake Python ray walk
(``envs/graph_snake_env.py:18-97``): per snake, 5 rays (forward, left,
right, forward-left diagonal, forward-right diagonal) accumulate
distance-weighted channel vectors — cardinal weight ``1/d``, diagonal
``1/(d*sqrt(2))`` — walking outward from the head and stopping at (and
including) the first wall-channel hit.

Shape note: the reference emits rows ONLY for alive snakes (and, due to a
compaction bug, indexes the j-th alive snake's rays into the j-th *snake's*
observation — graph_snake_env.py:62-64). In fixed-shape land we emit
``(num_snakes, 5, C)`` with all-zero rows for dead snakes, and always pair
each snake with its own observation; the reference's compaction bug is
documented, not replicated.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from marlsnake_tpu.core import types as T

# converted to a jnp array lazily inside ray_features: a module-level
# jnp.asarray would initialize the XLA backend at import time, breaking
# jax.distributed.initialize for programs that import marlsnake_tpu first
_DIR_DELTA = T.DIR_DELTA


def ray_features(cfg: T.EnvConfig, obs: jnp.ndarray, head: jnp.ndarray,
                 direction: jnp.ndarray, alive: jnp.ndarray) -> jnp.ndarray:
    """(N, Ho, Wo, C) obs -> (N, 5, C) float32 ray features."""
    n, ho, wo, c = obs.shape
    v = cfg.vision_range if cfg.vision_range else 5

    left = (direction - 1) % 4
    right = (direction + 1) % 4
    card = jnp.stack([direction, left, right], axis=1)       # (N, 3)
    card_d = jnp.asarray(_DIR_DELTA)[card]                   # (N, 3, 2)
    diag_d = jnp.stack([card_d[:, 0] + card_d[:, 1],
                        card_d[:, 0] + card_d[:, 2]], axis=1)  # (N, 2, 2)
    all_d = jnp.concatenate([card_d, diag_d], axis=1)        # (N, 5, 2)

    if cfg.vision_range:
        center = jnp.full_like(head, cfg.vision_range)
    else:
        center = head
    steps = jnp.arange(1, v + 1)                             # (v,)
    cells = (center[:, None, None, :]
             + all_d[:, :, None, :] * steps[None, None, :, None])
    rr = jnp.clip(cells[..., 0], 0, ho - 1)
    cc = jnp.clip(cells[..., 1], 0, wo - 1)
    vals = obs[jnp.arange(n)[:, None, None], rr, cc].astype(jnp.float32)

    wall_hit = vals[..., 0] == 1                             # (N, 5, v)
    # include a cell unless a wall was hit strictly before it
    prior_wall = (jnp.cumsum(wall_hit, axis=-1) - wall_hit) > 0
    include = (~prior_wall).astype(jnp.float32)

    inv = 1.0 / steps.astype(jnp.float32)
    w = jnp.concatenate([
        jnp.broadcast_to(inv, (3, v)),
        jnp.broadcast_to(inv / math.sqrt(2.0), (2, v)),
    ], axis=0)                                               # (5, v)

    feats = (vals * (include * w[None])[..., None]).sum(axis=2)  # (N, 5, C)
    return jnp.where(alive[:, None, None], feats, 0.0)
