"""EnvState: the full environment state as a fixed-shape JAX PyTree.

This replaces the reference's mutable object soup (``SnakeEnv.grid`` +
``List[Snake]`` deques + Python episodic-stat arrays, see
``envs/snake_env.py:89-92,131-159`` and ``core/snake.py:52-107``) with a
single immutable PyTree suitable for ``vmap``/``jit``/``shard_map``.

Snake bodies are represented as fixed-capacity *direction ring buffers*
(the TPU-shaped analog of the reference's ``deque`` of directions at
``core/snake.py:71``): per snake we store the head/tail coordinates, the
current heading, and a ring of past move directions. Logical slot
``ring_head[i]`` holds the newest direction (head link); the oldest (tail
link) lives at ``(ring_head + ring_len - 1) % capacity``. Tail retraction
pops the oldest direction and advances the tail coordinate by its delta —
exactly ``Snake.move`` (``core/snake.py:96-107``) without dynamic shapes.

Storage is 2-BIT PACKED: 16 direction slots per int32 word (slot ``s`` sits
at bits ``2*(s & 15)`` of word ``s >> 4``), so the array carried through
the scan/autoreset-select is 16x smaller than one-int32-per-slot and every
ring op's one-hot runs over ``ceil(cap/16)`` words instead of ``cap``
lanes. (Plain int8 narrowing had measured SLOWER — widening + minor-dim
lane waste, CLAUDE.md — but bit-packing into full int32 words keeps the
lane shape and pays: headline measured in round 4.) Use
:func:`ring_slots` to unpack for host-side introspection.
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
    # (N, ceil(CAP/16)) int32 — 2-bit-packed direction ring buffer
    # (see module docstring for the slot <-> word/bit mapping)
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


def ring_num_words(cap: int) -> int:
    """int32 words backing a ``cap``-slot 2-bit-packed ring."""
    return -(-cap // 16)


def ring_pack_prefix(dirs: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Pack directions into slots 0..L-1 of a fresh ring (rest zero).

    ``dirs`` is (..., L) int32 with L static (reset paints L = k-1
    links); returns (..., ring_num_words(cap)) int32.
    """
    length = dirs.shape[-1]
    words = []
    for i in range(ring_num_words(cap)):
        js = [j for j in range(length) if j >> 4 == i]
        if js:
            wv = sum(dirs[..., j] << (2 * (j & 15)) for j in js)
        else:
            wv = jnp.zeros(dirs.shape[:-1], jnp.int32)
        words.append(wv)
    return jnp.stack(words, axis=-1)


def ring_slots(ring, cap: int):
    """Unpack a 2-bit-packed ring to one direction per slot (..., cap).

    Host/introspection helper (uses a gather) — the hot-path ops below
    never unpack.
    """
    import numpy as np
    slots = np.arange(cap)
    words = ring[..., slots >> 4]
    return (words >> (2 * (slots & 15))) & 3


def ring_push(ring: jnp.ndarray, ring_head: jnp.ndarray,
              ring_len: jnp.ndarray, direction: jnp.ndarray,
              mask: jnp.ndarray, cap: int):
    """Append a new head-side direction for snakes where ``mask`` is True.

    Vectorized analog of ``Snake.directions.appendleft``
    (core/snake.py:98). The 2-bit blend touches every word lane but only
    the selected word is replaced — one fused elementwise pass over
    ceil(cap/16) words.
    """
    cw = ring.shape[-1]
    new_head = jnp.where(mask, (ring_head - 1) % cap, ring_head)
    b0 = 2 * (new_head & 15)
    blended = ((ring & ~(3 << b0)[:, None])
               | ((direction & 3) << b0)[:, None])
    sel = ((new_head >> 4)[:, None] == jnp.arange(cw)) & mask[:, None]
    updated = jnp.where(sel, blended, ring)
    new_len = jnp.where(mask, ring_len + 1, ring_len)
    return updated, new_head, new_len


def ring_pop_tail(ring: jnp.ndarray, ring_head: jnp.ndarray,
                  ring_len: jnp.ndarray, mask: jnp.ndarray, cap: int):
    """Pop the oldest (tail-side) direction where ``mask`` is True.

    Returns the popped direction (valid where mask) and the new length.
    Vectorized analog of ``Snake.directions.pop`` (core/snake.py:103).
    """
    cw = ring.shape[-1]
    idx = (ring_head + ring_len - 1) % cap
    # dense word select (one-hot select beats dynamic gather on TPU)
    onehot = (idx >> 4)[:, None] == jnp.arange(cw)[None, :]
    word = jnp.where(onehot, ring, 0).sum(axis=1)
    popped = (word >> (2 * (idx & 15))) & 3
    new_len = jnp.where(mask, ring_len - 1, ring_len)
    return popped, new_len


def tail_direction(ring: jnp.ndarray, ring_head: jnp.ndarray,
                   ring_len: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Direction of the oldest link (used for tail retraction)."""
    idx = (ring_head + ring_len - 1) % cap
    rows = jnp.arange(ring.shape[0])
    word = ring[rows, idx >> 4]
    return (word >> (2 * (idx & 15))) & 3


def body_coords_mask(state: EnvState, snake_idx: int) -> jnp.ndarray:
    """(H, W) bool mask of cells owned by ``snake_idx`` (head+body+tail)."""
    t = T.cell_type(state.grid)
    owner = T.cell_owner(state.grid)
    return (t >= T.HEAD) & (owner == snake_idx)
