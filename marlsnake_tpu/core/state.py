"""EnvState: the full environment state as a fixed-shape JAX PyTree.

This replaces the reference's mutable object soup (``SnakeEnv.grid`` +
``List[Snake]`` deques + Python episodic-stat arrays, see
``envs/snake_env.py:89-92,131-159`` and ``core/snake.py:52-107``) with a
single immutable PyTree suitable for ``vmap``/``jit``/``shard_map``.

Snake bodies are represented as fixed-capacity *direction ring buffers*
(the TPU-shaped analog of the reference's ``deque`` of directions at
``core/snake.py:71``): per snake we store the head/tail coordinates, the
current heading, and a ring of past move directions. ``ring[i, ring_head[i]]``
is the newest direction (head link); the oldest (tail link) lives at
``(ring_head + ring_len - 1) % capacity``. Tail retraction pops the oldest
direction and advances the tail coordinate by its delta — exactly
``Snake.move`` (``core/snake.py:96-107``) without dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from marlsnake_tpu.core import types as T


@struct.dataclass
class EnvState:
    # (H, W) int32 — cell = cell_type | (snake_idx << types.OWNER_SHIFT)
    # (same field encoding as reference envs/snake_env.py:140-144)
    grid: jnp.ndarray
    # (N,) int32 — current heading index into DIR_DELTA
    direction: jnp.ndarray
    # (N, 2) int32 — head / tail coordinates (row, col)
    head: jnp.ndarray
    tail: jnp.ndarray
    # (N, CAP) int32 — direction ring buffer (newest at ring_head).
    # Directions fit in 2 bits, but int8 storage measured SLOWER: the
    # ring is tiny (1MB/step at 4096 envs — not bandwidth-bound) and
    # int8 minor dims waste VPU lanes / pay widening on every pop
    # (same finding as the reverted int8 grid, CLAUDE.md)
    ring: jnp.ndarray
    # (N,) int32
    ring_head: jnp.ndarray
    ring_len: jnp.ndarray  # = body length - 1
    # (N,) bool
    alive: jnp.ndarray
    # () int32 — running alive counter, including the reference's
    # double-decrement quirk on tail-chase deaths (envs/snake_env.py:334-346)
    alive_count: jnp.ndarray
    # (N,) float32 episodic stats (reference envs/snake_env.py:438-442)
    epi_scores: jnp.ndarray
    epi_steps: jnp.ndarray
    epi_fruits: jnp.ndarray
    epi_kills: jnp.ndarray
    # () int32
    episode_length: jnp.ndarray
    # (frame_stack, N, Ho, Wo, 8) uint8 — encoded obs frames, oldest first
    # (device-resident replacement of the reference's frame deque,
    #  envs/snake_env.py:444-459). Only carried for vision_range configs
    # with frame_stack > 1; zero-size otherwise.
    obs_stack: jnp.ndarray
    # (frame_stack - 1, H, W) int32 — previous RAW grids, oldest first.
    # Full-obs frame_stack > 1 configs re-encode history frames from
    # these at obs time instead of rolling a stack of encoded frames:
    # the encode is deterministic in the grid (bit-identical obs) and a
    # grid is ~13x smaller than its (N, H, W, 8) encoding, so the
    # per-step history roll moves 630MB -> 13MB at 4096 envs x 8 snakes
    # x frame_stack 4. Zero-size when unused.
    hist_grid: jnp.ndarray
    # PRNG key consumed by fruit respawn each step
    key: jnp.ndarray

    @property
    def body_length(self) -> jnp.ndarray:
        return self.ring_len + 1


def ring_push(ring: jnp.ndarray, ring_head: jnp.ndarray,
              ring_len: jnp.ndarray, direction: jnp.ndarray,
              mask: jnp.ndarray):
    """Append a new head-side direction for snakes where ``mask`` is True.

    Vectorized analog of ``Snake.directions.appendleft``
    (core/snake.py:98).
    """
    from marlsnake_tpu.ops.scatter import dense_set_rows
    cap = ring.shape[-1]
    new_head = jnp.where(mask, (ring_head - 1) % cap, ring_head)
    updated = dense_set_rows(ring, new_head, direction, mask)
    new_len = jnp.where(mask, ring_len + 1, ring_len)
    return updated, new_head, new_len


def ring_pop_tail(ring: jnp.ndarray, ring_head: jnp.ndarray,
                  ring_len: jnp.ndarray, mask: jnp.ndarray):
    """Pop the oldest (tail-side) direction where ``mask`` is True.

    Returns the popped direction (valid where mask) and the new length.
    Vectorized analog of ``Snake.directions.pop`` (core/snake.py:103).
    """
    cap = ring.shape[-1]
    idx = (ring_head + ring_len - 1) % cap
    # dense row gather (one-hot select beats dynamic gather on TPU)
    onehot = idx[:, None] == jnp.arange(cap)[None, :]
    popped = jnp.where(onehot, ring.astype(jnp.int32), 0).sum(axis=1)
    new_len = jnp.where(mask, ring_len - 1, ring_len)
    return popped, new_len


def tail_direction(ring: jnp.ndarray, ring_head: jnp.ndarray,
                   ring_len: jnp.ndarray) -> jnp.ndarray:
    """Direction of the oldest link (used for tail retraction)."""
    cap = ring.shape[-1]
    rows = jnp.arange(ring.shape[0])
    idx = (ring_head + ring_len - 1) % cap
    return ring[rows, idx]


def body_coords_mask(state: EnvState, snake_idx: int) -> jnp.ndarray:
    """(H, W) bool mask of cells owned by ``snake_idx`` (head+body+tail)."""
    t = T.cell_type(state.grid)
    owner = T.cell_owner(state.grid)
    return (t >= T.HEAD) & (owner == snake_idx)
