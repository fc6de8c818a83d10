"""The TPU-native MARL-Snake engine: pure functional reset/step kernels.

This is a ground-up re-design of the reference game engine
(``/root/reference/marlenv/marlenv/envs/snake_env.py:131-632``) as fixed-shape
masked array programs: one fused ``step(state, actions) -> (state', out)``
that jits end-to-end and vmaps over thousands of env instances.

Semantics parity notes (cross-checked against the reference, cited per phase):

* Phase 1 — direction update & proposed heads (snake_env.py:318-330): dead
  snakes keep their heading and never move.
* Phase 2 — collision vs the PRE-move grid (snake_env.py:521-544):
  - >=2 heads on one cell: all die, no kill credit; a fruit there still
    counts toward respawn (``fruit_taken``).
  - target WALL/BODY/HEAD: mover dies; the owner of the hit cell gets
    ``kills += 1`` once per distinct target cell — including itself on a
    self-collision (snake_env.py:537-538).
  - single head on FRUIT: eat.
* Phase 3 — tail-chase rule (snake_env.py:338-346): if an eater's old tail
  cell is some snake's target, every such chaser dies and the eater gets one
  kill per chaser. The reference decrements its alive counter here WITHOUT
  checking whether the chaser already died in phase 2 (double-decrement
  quirk); we reproduce that arithmetic in ``alive_count`` because the win
  flag reads it.
* Phase 4 — win flag (snake_env.py:347-352): re-derived every step from
  ``alive_count == 1``, set on the FIRST alive snake only (the reference
  iterates in index order and breaks). The distinction is reachable: the
  phase-3 double-decrement quirk can drive ``alive_count`` to 1 while >=3
  snakes are actually alive (num_snakes >= 5, eater + 2 chasers that also
  multi-collide -> 4 decrements for 2 deaths).
* Phase 5 — rewards (snake_env.py:358-374): snakes already dead before the
  step get exactly 0; no time reward on the dying step.
* Phase 6 — grid update: the reference mutates sequentially in snake-index
  order (snake_env.py:546-566); the outcome is order-independent (each cell
  has exactly one final writer), which lets us use masked parallel writes in
  a fixed order: erase dead bodies -> old heads to BODY -> retracting tails
  to EMPTY -> new heads -> new tails.
* Phase 7 — fruit respawn (snake_env.py:376-379 + grid_util.py:126-133):
  ``fruit_taken`` uniform draws over the empty cells WITH replacement
  (duplicate draws collapse into one fruit, like the reference).
* Phase 8 — obs/stats/timeout/rank (snake_env.py:381-414): the dying step's
  reward/steps are excluded from episodic stats; ranks are competition-style
  ("1224"); stats reset when the episode-done predicate fires.

RNG: ``jax.random`` keys replace the reference's global ``np.random``; the
host oracle (``marlsnake_tpu.oracle``) mirrors this exact key schedule so
engine and oracle trajectories are bit-identical.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from marlsnake_tpu.core import types as T
from marlsnake_tpu.core.state import (
    EnvState, ring_pack_prefix, ring_push, ring_pop_tail)
from marlsnake_tpu.ops.scatter import dense_add_1d, dense_set_1d

# numpy on purpose: a module-level jnp.asarray would initialize the XLA
# backend at import time, breaking jax.distributed.initialize for any
# program that imports marlsnake_tpu first. Tracer == numpy broadcasting
# is fine; the constant is baked at trace time.
_DIR_DELTA = T.DIR_DELTA

# Largest board (in cells) whose place_fruits prefix sum runs as an MXU
# matmul with f32 accumulation instead of the reduce-window cumsum
# (see place_fruits; measured crossover notes there).
_FRUITS_MXU_MAX_CELLS = int(
    os.environ.get('SNAKE_FRUITS_MXU_MAX_CELLS', '1024'))

@struct.dataclass
class StepOutput:
    obs: jnp.ndarray      # (N, Ho, Wo, 8*frame_stack) uint8
    reward: jnp.ndarray   # (N,) float32
    done: jnp.ndarray     # (N,) bool
    # info — fixed-shape; *_stats fields are meaningful when done_all is True
    # (reference puts them in `info` only at episode end, snake_env.py:396-410)
    rank: jnp.ndarray            # (N,) int32
    episode_scores: jnp.ndarray  # (N,) float32
    episode_steps: jnp.ndarray   # (N,) float32
    episode_fruits: jnp.ndarray  # (N,) float32
    episode_kills: jnp.ndarray   # (N,) float32
    done_all: jnp.ndarray        # () bool — the episode-done predicate


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def delta_to_dir(delta: jnp.ndarray) -> jnp.ndarray:
    """Map (..., 2) coordinate deltas to direction indices."""
    eq = (delta[..., None, :] == _DIR_DELTA).all(-1)
    return jnp.argmax(eq, axis=-1).astype(jnp.int32)


def flat_delta_to_dir(d: jnp.ndarray, w: int) -> jnp.ndarray:
    """Map flat-index deltas (row-major, width ``w``) to direction indices.

    -w -> UP, +1 -> RIGHT, +w -> DOWN, -1 -> LEFT. Compare/select
    arithmetic on the flat cells avoids the ``//w``/``%w`` divides of a
    coordinate round-trip (s32 division is a multi-instruction VPU
    sequence; the spawn-path divmod was 2ms/64steps in device traces).

    Caller contract: ``d`` must be one of {-w, -1, +1, +w} with w >= 2
    (adjacent in-bounds cells on a bordered board). Any other delta maps
    to LEFT unvalidated, and a degenerate w <= 1 board aliases ±w with
    ±1 — spawn candidates satisfy this by construction.
    """
    return jnp.where(
        d == -w, T.UP,
        jnp.where(d == 1, T.RIGHT,
                  jnp.where(d == w, T.DOWN, T.LEFT))).astype(jnp.int32)


def dir_delta(d: jnp.ndarray) -> jnp.ndarray:
    """``DIR_DELTA[d]`` as compare/select arithmetic — no gather.

    Tiny-table gathers lower to kCustom dynamic-gather fusions that
    dominated step traces (11ms/step at 4096 envs for the turn table
    alone); the arithmetic form fuses into neighboring elementwise work.
    DIR_DELTA order: UP(-1,0) RIGHT(0,1) DOWN(1,0) LEFT(0,-1).
    """
    dr = (d == T.DOWN).astype(jnp.int32) - (d == T.UP).astype(jnp.int32)
    dc = (d == T.RIGHT).astype(jnp.int32) - (d == T.LEFT).astype(jnp.int32)
    return jnp.stack([dr, dc], axis=-1)


def next_direction(cfg: T.EnvConfig, direction: jnp.ndarray,
                   actions: jnp.ndarray) -> jnp.ndarray:
    """``TURN[direction, actions]`` as arithmetic (bit-equal to the
    tables in core/types.py; reference semantics snake_env.py:598-632)."""
    a = jnp.clip(actions.astype(jnp.int32), 0, 4)
    if cfg.observer == 'human':
        horiz = direction % 2 == 1
        return jnp.where(
            horiz & (a == 3), T.DOWN,
            jnp.where(horiz & (a == 4), T.UP,
                      jnp.where(~horiz & (a == 1), T.LEFT,
                                jnp.where(~horiz & (a == 2), T.RIGHT,
                                          direction))))
    turn = (a == 2).astype(jnp.int32) - (a == 1).astype(jnp.int32)
    return (direction + turn + 4) & 3


def place_fruits(grid: jnp.ndarray, u: jnp.ndarray,
                 count: jnp.ndarray) -> jnp.ndarray:
    """Place up to ``count`` fruits from uniform draws ``u``.

    Rejection-free equivalent of the reference's
    ``random_empty_coords`` + assignment (grid_util.py:126-133,
    snake_env.py:376-379): empty cells are enumerated once in row-major
    order; each draw independently selects one WITH replacement.
    """
    h, w = grid.shape
    flat = grid.reshape(-1)
    mask = flat == T.EMPTY
    # Prefix-sum lowering is board-size dependent on TPU: jnp.cumsum
    # lowers to an O(L^2) reduce-window that dominates SMALL boards
    # (2x9.3ms/64 steps at 8192 10x10 envs = 52% of device time) but
    # fuses well at 400 cells where log-depth scan passes measure 8%
    # SLOWER. Below 256 cells the prefix sum rides the MXU as one
    # mask @ triangular-ones matmul — bf16 is EXACT for counts < 256,
    # and the vmapped matvec batches into a single (B, L) @ (L, L).
    if h * w < 256:
        tri = jnp.triu(jnp.ones((h * w, h * w), jnp.bfloat16))
        cum = (mask.astype(jnp.bfloat16) @ tri).astype(jnp.int32)
    elif h * w <= _FRUITS_MXU_MAX_CELLS:
        # bf16 one-hot operands with FORCED f32 accumulation: exact for
        # any count (unlike the bf16-accumulate small-board form above,
        # which caps at 256) and rides the MXU at the bf16 rate. At 400
        # cells this beats the reduce-window cumsum (headline 10.37M ->
        # 10.71M at 4096 envs, round 4); both forms are O(L^2), but the
        # MXU's rate advantage fades as L grows and the (L, L) triangle
        # stops fitting fusion-friendly tiles — gated by cell count
        # (override SNAKE_FRUITS_MXU_MAX_CELLS to re-measure).
        tri = jnp.triu(jnp.ones((h * w, h * w), jnp.bfloat16))
        cum = jnp.matmul(mask.astype(jnp.bfloat16), tri,
                         preferred_element_type=jnp.float32
                         ).astype(jnp.int32)
    else:
        cum = jnp.cumsum(mask.astype(jnp.int32))
    # the prefix sum's last element IS the empty count (exact in every
    # branch) — a separate mask.sum() cost its own 1.45ms/64-steps
    # reduce fusion at 4096 envs in round-4 traces
    num_empty = cum[-1]
    r = jnp.floor(u * num_empty).astype(jnp.int32)
    r = jnp.clip(r, 0, jnp.maximum(num_empty - 1, 0))
    valid = (jnp.arange(u.shape[0]) < count) & (num_empty > 0)
    r = jnp.where(valid, r, -2)
    # Draw k selects the first cell with cum > r[k]; since cum increments
    # by exactly 1 at each EMPTY cell, that is the unique EMPTY cell where
    # cum == r[k]+1. K is static and tiny (max(num_snakes, num_fruits)),
    # so the K axis is UNROLLED into chained scalar-broadcast ORs — one
    # fused elementwise pass over (L,) instead of materializing a
    # (K, L) compare + reduce_or (round 5: headline 15.5M -> 16.7M; the
    # reduce form's intermediate was ~1.4ms/64 steps of fusion overhead
    # against ~26M nominal ops).
    hit = jnp.zeros_like(mask)
    for k in range(u.shape[0]):
        hit = hit | (cum == r[k] + 1)
    hit = hit & mask
    return jnp.where(hit, T.FRUIT, flat).reshape(h, w)


def place_fruits_at(grid: jnp.ndarray, cells: jnp.ndarray) -> jnp.ndarray:
    """Place fruits at explicit flat cell indices (replay mode).

    ``cells`` is (K,) int32 of row-major flat indices; negative entries are
    padding. Used by the reference-RNG replay harness: the cells the
    ACTUAL reference drew from the global ``np.random`` stream
    (grid_util.py:126-133) are captured on host and fed here verbatim, so
    the jitted engine consumes the reference's randomness instead of a
    jax.random key. Only EMPTY cells are written (the reference draws over
    empty cells by construction; duplicates collapse like its
    with-replacement semantics)."""
    h, w = grid.shape
    flat = grid.reshape(-1)
    hit = (cells[:, None] == jnp.arange(h * w)[None, :]).any(0)
    return jnp.where(hit & (flat == T.EMPTY), T.FRUIT, flat).reshape(h, w)


def encode_frame(cfg: T.EnvConfig, grid: jnp.ndarray) -> jnp.ndarray:
    """8-channel per-snake observation of one grid (N, Ho, Wo, 8) uint8.

    Vectorized replacement of the reference's per-cell Python loop
    (snake_env.py:474-519). Channel order: wall, fruit, other-head,
    other-body, other-tail, my-head, my-body, my-tail. Deliberately a
    function of the grid ALONE — frame-stack history re-encodes PAST
    grids through this function (see ``_encode_and_stack``), which is
    only sound while no current-step state (head/alive) leaks in.
    """
    n = cfg.num_snakes
    t = T.cell_type(grid)
    owner = T.cell_owner(grid)
    # Round 5: build the PACKED byte first (shared across snakes except
    # the owner's bits 2..4 shifting to 5..7 — see encode_frame_packed),
    # then unpack bits to channels: ~2 ops per output element on the
    # (N, H, W, 8) axis instead of the previous channel-compare chain
    # (env_hit | snake_hit forms, ~6 ops each). Bit-identical (channel
    # c of the one-hot IS bit c of the packed byte); measured headline
    # 13.1M -> 15.7M env-steps/s at 4096 envs (procedural reset).
    # ch 0 wall, 1 fruit, 2..4 other head/body/tail, 5..7 my head/body/tail
    shift = jnp.where(t == T.WALL, 0,
                      jnp.where(t == T.FRUIT, 1, 2 + (t - T.HEAD)))
    base = jnp.where(t > T.EMPTY, (1 << shift), 0)
    ids = jnp.arange(n).reshape(n, 1, 1)
    is_mine = (t >= T.HEAD)[None] & (owner[None] == ids)
    byte = jnp.where(is_mine, base[None] << 3, base[None])  # (N, H, W)
    c = jnp.arange(T.FEATURE_CHANNEL).reshape(1, 1, 1, -1)
    return ((byte[..., None] >> c) & 1).astype(jnp.uint8)


def encode_frame_cropped(cfg: T.EnvConfig, grid: jnp.ndarray,
                         head: jnp.ndarray,
                         alive: jnp.ndarray) -> jnp.ndarray:
    """Vision-range observation encoded DIRECTLY from the grid window.

    Instead of encoding the full grid and cropping with per-snake
    dynamic_slice (25x slower on TPU — per-lane slicing defeats
    vectorization), the (2v+1)^2 window of raw cells is gathered densely
    with one-hot row/column selectors and encoded in place. Out-of-grid
    cells select nothing -> EMPTY -> all-zero channels, identical to the
    reference's zero-padded crop (snake_env.py:497-517), including the
    dead-snake (0, 0) anchor quirk.

    The gather is two fused elementwise one-hot select+reduce passes
    over a u32-PACKED word plane — deliberately NOT einsum/matmul.
    Measured on TPU at 4096 envs (tools/exp_vision.py, full rollout):
    elementwise selects 4.1M env-steps/s vs 2.7M for one-hot einsums
    (the batched (11,20)@(20,20) matmuls are tiny for the MXU and force
    layout-copy seams between the matmul outputs and the elementwise
    channel encode, ~14ms/step of pure transposes), 2.9M for bf16
    einsums, and 2.3M for windowing a bit-packed pre-encoded frame. XLA
    fuses the where+reduce chain into the channel encode with no
    intermediate materialization.

    Round 3 applies the spawn-blob u32 insight (CLAUDE.md): dense
    compare+select cost scales with ELEMENT count, so 4 cells pack into
    one LE u32 word along W (cells fit a byte for num_snakes <= 15:
    type | owner<<4) and BOTH passes run on the 4x-narrower word plane
    — rows first, then column words, then a single per-column byte
    shift+mask unpack at the final (N, y, x) window. Out-of-range cx
    yields word index cx>>2 = -1 (arithmetic shift) or >= ceil(W/4) ->
    no match -> 0 -> EMPTY, identical to the unpacked form. Measured
    7.48M -> 8.59M env-steps/s (vision5 rollout; row-first beats
    column-first at 8.15M — with packing the W axis survives both
    passes as the minor dim so both shrink 4x). Falls back to the
    unpacked column-first gather when num_snakes > 16 (max cell
    TAIL | 15<<4 = 245 still fits a byte at n=16).

    Round-4 refutations (tools/exp_vision.py, measured on TPU): 4-bit
    palette packing (8 cells/word, n <= 4) 8.06M vs 9.22M baseline —
    narrower word planes stop paying below ~5 words; H-word byte-select
    exploiting window-row consecutiveness ('hwords') 8.52-8.77M — the
    extra expand pass eats the smaller selects.
    """
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range
    v2 = 2 * v + 1
    center = jnp.where(alive[:, None], head, 0)
    ry = center[:, 0, None] + jnp.arange(v2) - v   # (N, v2) source rows
    cx = center[:, 1, None] + jnp.arange(v2) - v   # (N, v2) source cols
    # win[n, y, x] = grid[ry[n, y], cx[n, x]] (0 when out of bounds).
    # Round 5: both one-hot passes are UNROLLED over their static table
    # axis into chained selects (the dense_set_1d / fruit-hit lesson —
    # chained scalar-broadcast selects beat materializing a one-hot
    # intermediate + reduction): vision5 rollout 14.3M -> 20.4M
    # env-steps/s at 4096 envs, same-session comparison, bit-identical.
    if n <= 16:
        wp = (w + 3) // 4
        gpad = jnp.pad(grid, ((0, 0), (0, wp * 4 - w))).astype(jnp.int32)
        words = sum(gpad[:, i::4] << (8 * i) for i in range(4))  # (H, wp)
        # tmp[n, y, p] = words[ry[n, y], p] — unrolled over H rows
        tmp = jnp.zeros((n, v2, wp), jnp.int32)
        for hh in range(h):
            tmp = jnp.where((ry == hh)[:, :, None],
                            words[hh][None, None], tmp)
        # winw[n, y, x] = tmp[n, y, cx[n, x] >> 2] — unrolled over the
        # ceil(W/4) column words
        cw = cx >> 2
        winw = jnp.zeros((n, v2, v2), jnp.int32)
        for pp in range(wp):
            winw = jnp.where((cw == pp)[:, None, :],
                             tmp[:, :, pp][..., None], winw)
        win = (winw >> ((cx & 3) * 8)[:, None, :]) & 0xFF
    else:
        # unpacked fallback (cells don't fit a byte): same unrolled
        # two-pass walk over raw grid columns then rows
        tmp = jnp.zeros((n, v2, w), jnp.int32)   # tmp[n, y, c] = grid[ry, c]
        for hh in range(h):
            tmp = jnp.where((ry == hh)[:, :, None],
                            grid[hh][None, None], tmp)
        win = jnp.zeros((n, v2, v2), jnp.int32)
        for cc_ in range(w):
            win = jnp.where((cx == cc_)[:, None, :],
                            tmp[:, :, cc_][..., None], win)

    # channel encode via the shared packed byte + bit unpack (same form
    # as encode_frame — bit-identical, ~2 ops per output element); the
    # window is per-snake already, so `mine` compares the OWN index only
    t = T.cell_type(win)
    owner = T.cell_owner(win)
    shift = jnp.where(t == T.WALL, 0,
                      jnp.where(t == T.FRUIT, 1, 2 + (t - T.HEAD)))
    base = jnp.where(t > T.EMPTY, (1 << shift), 0)
    ids = jnp.arange(n).reshape(n, 1, 1)
    is_mine = (t >= T.HEAD) & (owner == ids)
    byte = jnp.where(is_mine, base << 3, base)
    c = jnp.arange(T.FEATURE_CHANNEL).reshape(1, 1, 1, -1)
    return ((byte[..., None] >> c) & 1).astype(jnp.uint8)


def encode_frame_packed(cfg: T.EnvConfig, grid: jnp.ndarray) -> jnp.ndarray:
    """Packed-byte observation of one grid, (N, H, W, 1) uint8.

    obs_format='packed': the 8 one-hot channels of :func:`encode_frame`
    collapse into one byte per cell (bit c = channel c — see
    ops/obs_pack.py). Computed DIRECTLY from the grid, so the encode
    never materializes the 8x-wider planes at all, and the per-snake
    axis costs ~2 ops/cell instead of the full channel select: the
    byte is SHARED across snakes except that the owner sees its bits
    2..4 (other head/body/tail) shifted to 5..7 (mine) — so one
    (H, W) base pass encodes everything as "other", and the (N, H, W)
    pass is a single owner-compare <<3 select. At the 30x30x8 fs4 row
    the per-frame encode was ~5.2ms/64 steps in traces (x4 frames);
    this form cut the encode family ~3x. Bit-identical to
    ``obs_pack.pack_frame(encode_frame(...))`` (tested).
    """
    n = cfg.num_snakes
    t = T.cell_type(grid)                       # (H, W)
    owner = T.cell_owner(grid)
    # channel index: 0 wall, 1 fruit, 2..4 other head/body/tail
    shift = jnp.where(t == T.WALL, 0,
                      jnp.where(t == T.FRUIT, 1, 2 + (t - T.HEAD)))
    base = jnp.where(t > T.EMPTY, (1 << shift), 0)
    ids = jnp.arange(n).reshape(n, 1, 1)
    is_mine = (t >= T.HEAD)[None] & (owner[None] == ids)
    byte = jnp.where(is_mine, base[None] << 3,
                     base[None]).astype(jnp.uint8)
    return byte[..., None]


def stack_to_obs(obs_stack: jnp.ndarray) -> jnp.ndarray:
    """(frame_stack, N, Ho, Wo, 8) -> (N, Ho, Wo, 8*frame_stack).

    Frames are channel-concatenated oldest-first, matching the reference's
    deque order (snake_env.py:444-459).
    """
    fs, n, h, w, c = obs_stack.shape
    return jnp.moveaxis(obs_stack, 0, 3).reshape(n, h, w, fs * c)


def make_empty_grid(cfg: T.EnvConfig) -> jnp.ndarray:
    """Bordered empty grid (reference grid_util.py:14-20), with custom
    interior walls when ``cfg.map_layout`` is set."""
    if cfg.map_layout is not None:
        from marlsnake_tpu.core.maps import parse_layout
        import numpy as np
        mask = parse_layout(cfg.map_layout)
        return jnp.asarray(
            np.where(mask, T.WALL, T.EMPTY).astype(np.int32))
    grid = jnp.full((cfg.height, cfg.width), T.EMPTY, dtype=jnp.int32)
    grid = grid.at[jnp.array([0, cfg.height - 1]), :].set(T.WALL)
    grid = grid.at[:, jnp.array([0, cfg.width - 1])].set(T.WALL)
    return grid


# ---------------------------------------------------------------------------
# reset
# ---------------------------------------------------------------------------

def _procedural_spawn(cfg: T.EnvConfig, k_spawn: jnp.ndarray):
    """Arithmetic on-device spawn (cfg.spawn_mode == 'procedural').

    Replaces the reference's DFS-enumerate + rejection-resample reset
    (snake_env.py:576-589) with a structured placement family that needs
    NO host precomputation and NO per-reset gather: snake i owns the
    contiguous band of interior rows [1 + i*b, 1 + (i+1)*b) with
    b = (height-2)//num_snakes, and samples from four uniforms
      * an orientation (``cfg.spawn_orientations == 'both'`` opt-in:
        horizontal / vertical — vertical only when the band is tall
        enough for a k-segment, b >= k; default 'horizontal' skips the
        draw's consumption entirely),
      * a position inside its band (row for horizontal; row start +
        any interior column for vertical — the whole vertical segment
        stays inside the band),
      * a column start c0 with the whole k-segment wall-free
        (horizontal),
      * a head side (left/right resp. top/bottom end of the segment).
    Segments confined to distinct row bands are disjoint by
    construction — no rejection loop, which under vmap would run at the
    max iteration count over the whole batch.

    Returns ``(cell_flat, grid)``: head-first (N, k) flat cells and the
    fully painted int32 reset grid. The paint is CLOSED-FORM per cell
    (the band→snake map is a static function of the row index, so the
    per-row segment parameters expand by a static repeat — no gather):
    a handful of fused compare/selects over (H, W) instead of the
    ~(N*k + 2N)-lane one-hot paint or the pool blob's row gather.

    Key schedule (mirrored bit-exactly by the oracle, 'jax' mode):
    ``u = uniform(k_spawn, (N, 4))``; floor-scaled with the same
    min-clamp as the pool-row pick. u0 = position-in-band, u1 = column,
    u2 = head side, u3 = orientation (drawn always; consumed only when
    ``cfg.spawn_orientations == 'both'`` and b >= k, so the uniform
    count never depends on the board or the knob).
    """
    n, k, h, w = (cfg.num_snakes, cfg.snake_length, cfg.height,
                  cfg.width)
    b = (h - 2) // n          # rows per band (>= 1, validated in config)
    s = w - 1 - k             # of possible column starts (>= 1)
    # static: vertical opted in AND a vertical k-segment fits a band
    allow_vertical = cfg.spawn_orientations == 'both' and b >= k
    u = jax.random.uniform(k_spawn, (n, 4))
    dr = jnp.minimum((u[:, 0] * b).astype(jnp.int32), b - 1)
    c0 = 1 + jnp.minimum((u[:, 1] * s).astype(jnp.int32), s - 1)
    side = u[:, 2] < 0.5      # True -> head at the LEFT (resp. TOP) end
    band0 = 1 + jnp.arange(n, dtype=jnp.int32) * b
    rows = band0 + dr
    head_col = jnp.where(side, c0, c0 + k - 1)
    tail_col = jnp.where(side, c0 + k - 1, c0)

    j = jnp.arange(k, dtype=jnp.int32)
    jj = jnp.where(side[:, None], j[None, :], (k - 1) - j[None, :])
    cell_flat = rows[:, None] * w + c0[:, None] + jj  # (N, k) head-first
    if allow_vertical:
        vert = u[:, 3] < 0.5
        sv = b - k + 1        # vertical row starts inside the band
        r0 = band0 + jnp.minimum((u[:, 0] * sv).astype(jnp.int32),
                                 sv - 1)
        cv = 1 + jnp.minimum((u[:, 1] * (w - 2)).astype(jnp.int32),
                             w - 3)
        head_row = jnp.where(side, r0, r0 + k - 1)
        tail_row = jnp.where(side, r0 + k - 1, r0)
        v_cells = (r0[:, None] + jj) * w + cv[:, None]
        cell_flat = jnp.where(vert[:, None], v_cells, cell_flat)

    # closed-form paint: expand per-snake params to per-row vectors by
    # the STATIC band layout (row 0 border, n*b band rows, leftover +
    # bottom border never spawn)
    pad = h - 1 - n * b

    def expand(v, fill):
        return jnp.concatenate([
            jnp.full((1,), fill, v.dtype),
            jnp.repeat(v, b, total_repeat_length=n * b),
            jnp.full((pad,), fill, v.dtype)])

    ids = jnp.arange(n, dtype=jnp.int32) << T.OWNER_SHIFT
    ids_r = expand(ids, 0)
    rr = jnp.arange(h, dtype=jnp.int32)
    cc = jnp.arange(w, dtype=jnp.int32)[None, :]
    if not allow_vertical:
        row_r = expand(rows, -1)    # (h,): chosen row of this row's band
        c0_r = expand(c0, 0)
        hc_r = expand(head_col, -1)
        tc_r = expand(tail_col, -1)
        on_row = (rr == row_r)[:, None]             # (h, 1)
        in_seg = (on_row & (cc >= c0_r[:, None])
                  & (cc < c0_r[:, None] + k))
        val = jnp.where(
            cc == hc_r[:, None], T.HEAD + ids_r[:, None],
            jnp.where(cc == tc_r[:, None], T.TAIL + ids_r[:, None],
                      T.BODY + ids_r[:, None]))
    else:
        # GENERALIZED-SEGMENT paint: both orientations share ONE set of
        # (H, W) compares — per row, the segment is a column range
        # [st, st+ln) gated by a per-row active bit (horizontal: the
        # chosen row with ln=k; vertical: the k rows [r0, r0+k) with
        # ln=1), and head/tail are (row, col) point masks. All the
        # orientation branching happens on (h,)-sized vectors, so the
        # vertical family costs ~2 extra (H, W) compares instead of a
        # second full paint path (measured: the dual-path form cost the
        # procedural headline ~3%, 17.6M -> 17.1M).
        # per-row active bit (h,): vertical rows compare against the
        # band-expanded [r0, r0+k) range, horizontal against the row
        vert_r = expand(vert, False)
        r0_r = expand(r0, -1)
        row_r = expand(rows, -1)
        active = jnp.where(vert_r, (rr >= r0_r) & (rr < r0_r + k),
                           rr == row_r)
        st_r = expand(jnp.where(vert, cv, c0), 0)
        ln_r = expand(jnp.where(vert, 1, k), 0)
        hr_r = expand(jnp.where(vert, head_row, rows), -1)
        hc_r = expand(jnp.where(vert, cv, head_col), -1)
        tr_r = expand(jnp.where(vert, tail_row, rows), -1)
        tc_r = expand(jnp.where(vert, cv, tail_col), -1)
        in_seg = (active[:, None] & (cc >= st_r[:, None])
                  & (cc < (st_r + ln_r)[:, None]))
        head_m = (rr == hr_r)[:, None] & (cc == hc_r[:, None])
        tail_m = (rr == tr_r)[:, None] & (cc == tc_r[:, None])
        val = jnp.where(head_m, T.HEAD + ids_r[:, None],
                        jnp.where(tail_m, T.TAIL + ids_r[:, None],
                                  T.BODY + ids_r[:, None]))
    grid = jnp.where(in_seg, val, make_empty_grid(cfg))
    # materialize the painted grid ONCE: without the barrier XLA inlines
    # the whole paint expression into every consumer fusion (autoreset
    # select, place_fruits mask/hit, obs encode), re-computing it several
    # times over
    grid = jax.lax.optimization_barrier(grid)
    return cell_flat, grid


def _reset_core(cfg: T.EnvConfig, spawn, key: jnp.ndarray,
                spawn_cells=None, fruit_cells=None,
                _defer_fruits: bool = False):
    """Reset WITHOUT observation encoding (obs_stack left as the empty
    placeholder); see :func:`reset` for the public API.

    Replaces the reference's per-reset DFS + rejection loop
    (snake_env.py:131-159,576-589): candidate paths are pre-enumerated once
    per config, disjoint N-tuples are rejection-sampled ONCE on the host,
    and their coords/ring-dirs fully precomputed per row
    (spawn.spawn_data) — reset draws one pool row with a single gather; no
    device-side retry loop, which would otherwise iterate to the max
    rejection count over the whole vmapped env batch.

    Key schedule (mirrored by the oracle): fold_in(key, 0) -> pool row,
    fold_in(key, 1) -> fruits, fold_in(key, 2) -> stored per-step key.

    Replay mode (reference-RNG parity): ``spawn_cells`` (N, k) int32
    head-first flat cells and ``fruit_cells`` (F,) int32 flat cells
    (negative = padding) override the PRNG draws with randomness captured
    from the ACTUAL reference run — see tests/test_engine_vs_reference_replay.
    """
    n = cfg.num_snakes
    k = cfg.snake_length
    h, w = cfg.height, cfg.width
    k_fruit = jax.random.fold_in(key, 1)
    k_state = jax.random.fold_in(key, 2)

    grid = None
    if spawn_cells is None and cfg.spawn_mode == 'procedural':
        k_spawn = jax.random.fold_in(key, 0)
        cell_flat, grid = _procedural_spawn(cfg, k_spawn)
    elif spawn_cells is None:
        k_spawn = jax.random.fold_in(key, 0)
        num_pool = spawn.cells.shape[0]
        u = jax.random.uniform(k_spawn, ())
        row = jnp.minimum((u * num_pool).astype(jnp.int32), num_pool - 1)
        blob = getattr(spawn, 'blob', None)
        if blob is not None:
            # ONE row gather fetches the host-painted reset grid AND the
            # flat cells, packed as LE u32 words (spawn.SpawnData): the
            # kCustom dynamic-gather cost scales with element count, so
            # word rows beat byte rows ~25%; the paint reductions the
            # blob replaces cost ~2.5ms/64 steps at 4096 envs. Unpacking
            # is cheap fused VPU shifts.
            rowdata = blob[row].astype(jnp.int32)  # words < 2^31: grid
            # bytes are packed codes <= 117, cell u16s are < H*W <= 65535.
            # (4-bit palette packing of the grid section — 56 words
            # instead of 106 — measured a net LOSS, 10.37M -> 9.42M: the
            # gather only shrank 2.90 -> 2.78ms/64 steps (latency-bound
            # at this size, not element-bound) while the nibble decode
            # materialized a 1.27ms concatenate and shifted fusion
            # boundaries in place_fruits. Round-4 refutation.)
            n_gw = -(-(h * w) // 4)
            gw = rowdata[:n_gw]
            gbytes = jnp.stack(
                [gw & 0xFF, (gw >> 8) & 0xFF, (gw >> 16) & 0xFF,
                 (gw >> 24) & 0xFF], axis=-1).reshape(-1)
            grid = gbytes[:h * w].reshape(h, w)
            cw = rowdata[n_gw:]
            # mask BOTH halves: cw is int32, so a bare >>16 would
            # sign-extend cell indices >= 32768 (boards with
            # 32768 < H*W <= 65535 pass the blob gate) into negative
            # flat indices and silently corrupt the reset paint/ring
            cell16 = jnp.stack([cw & 0xFFFF, (cw >> 16) & 0xFFFF],
                               axis=-1).reshape(-1)
            cell_flat = cell16[:n * k].reshape(n, k)
        else:
            cell_flat = spawn.cells[row].astype(jnp.int32).reshape(n, k)
    else:
        cell_flat = spawn_cells.astype(jnp.int32).reshape(n, k)
    if grid is None:
        flat = make_empty_grid(cfg).reshape(-1)
        snake_ids = jnp.arange(n, dtype=jnp.int32) << T.OWNER_SHIFT
        # Paint body, then head, then tail (reference snake_env.py:
        # 138-144), as dense one-hot writes (disjoint across snakes).
        flat = dense_set_1d(flat, cell_flat.reshape(-1),
                            jnp.repeat(T.BODY + snake_ids, k))
        flat = dense_set_1d(flat, cell_flat[:, 0], T.HEAD + snake_ids)
        flat = dense_set_1d(flat, cell_flat[:, -1], T.TAIL + snake_ids)
        grid = flat.reshape(h, w)

    fruit_u = None
    if fruit_cells is not None:
        grid = place_fruits_at(grid, fruit_cells)
    else:
        nf = cfg.resolved_num_fruits
        u = (jax.random.uniform(k_fruit, (nf,)) if nf > 0
             else jnp.zeros((0,), jnp.float32))
        if _defer_fruits:
            fruit_u = u   # grid returned PRE-fruit; caller places
        elif nf > 0:
            grid = place_fruits(grid, u, jnp.int32(nf))

    # Direction ring: link j points from cell j+1 to cell j (reference
    # Snake.__init__, core/snake.py:62-71). Newest first. Computed on
    # device from FLAT-index deltas: feeding the ring from a precomputed
    # spawn.dirs[row] gather flips XLA's layout choice for the
    # (N, capacity) ring to a gather-friendly one that makes the ring
    # push/pop one-hot ops ~8x slower (measured 60ms/step at 4096 envs
    # vs ~3ms for this arithmetic), and a coords round-trip would pay
    # (N, k) s32 divmods.
    dirs = flat_delta_to_dir(cell_flat[:, :-1] - cell_flat[:, 1:], w)
    ring = ring_pack_prefix(dirs, cfg.body_capacity)

    hf, tf = cell_flat[:, 0], cell_flat[:, -1]
    head = jnp.stack([hf // w, hf % w], -1).astype(jnp.int32)
    tail = jnp.stack([tf // w, tf % w], -1).astype(jnp.int32)
    alive = jnp.ones((n,), dtype=bool)

    zeros_f = jnp.zeros((n,), dtype=jnp.float32)
    obs_shape = (n, cfg.obs_height, cfg.obs_width, cfg.frame_channels)
    hist_len = (cfg.frame_stack - 1) if _hist_mode(cfg) else 0
    hist_grid = jnp.broadcast_to(grid[None], (hist_len, h, w))
    state = EnvState(
        hist_grid=hist_grid,
        grid=grid,
        direction=dirs[:, 0],
        head=head, tail=tail,
        ring=ring,
        ring_head=jnp.zeros((n,), dtype=jnp.int32),
        ring_len=jnp.full((n,), k - 1, dtype=jnp.int32),
        alive=alive,
        alive_count=jnp.int32(n),
        epi_scores=zeros_f, epi_steps=zeros_f,
        epi_fruits=zeros_f, epi_kills=zeros_f,
        episode_length=jnp.int32(0),
        obs_stack=jnp.zeros((0,) + obs_shape, jnp.uint8),
        key=k_state,
    )
    if _defer_fruits:
        # hist_grid (hist mode) replicates the PRE-fruit grid here; the
        # caller must refresh it after placing fruits (see step_autoreset)
        return state, fruit_u
    return state


def _hist_mode(cfg: T.EnvConfig) -> bool:
    """True when frame-stack history is carried as RAW GRIDS and history
    frames are re-encoded at obs time (full-obs configs — the encode is
    deterministic in the grid and ~13x smaller to carry than its
    encoding). Vision configs keep the stored-frame stack: their encoded
    window frames are smaller than a full grid, so re-encoding the
    window fs times would cost more than it saves."""
    return cfg.frame_stack > 1 and not cfg.vision_range


def _encode_and_stack(cfg: T.EnvConfig, state: EnvState, old_stack,
                      reset_mode):
    """Encode the current frame and derive (obs, obs_stack).

    ``reset_mode`` may be True/False (static) or a traced bool scalar —
    the latter selects per element between the reset behavior (stack
    filled with the fresh frame, snake_env.py:444-459) and the step
    behavior (rolled stack). It only matters for the stored-frame stack
    (vision configs); in ``_hist_mode`` the reset/step distinction is
    already captured by ``state.hist_grid`` (a reset state carries its
    own grid replicated, so history frames equal the fresh frame).
    """
    packed = cfg.obs_format == 'packed'
    if cfg.vision_range:
        frame = encode_frame_cropped(cfg, state.grid, state.head,
                                     state.alive)
        if packed:
            # windows are small — pack the cropped planes (the shift
            # fuses into the window gather's epilogue)
            from marlsnake_tpu.ops.obs_pack import pack_frame
            frame = pack_frame(frame)
    elif packed:
        frame = encode_frame_packed(cfg, state.grid)
    else:
        frame = encode_frame(cfg, state.grid)
    if cfg.frame_stack == 1:
        # no history to carry: obs_stack stays the carried placeholder
        # (returning a fresh constant would strip its sharding/vma)
        return frame, None
    if _hist_mode(cfg):
        enc = encode_frame_packed if packed else encode_frame
        hists = [enc(cfg, state.hist_grid[i])
                 for i in range(cfg.frame_stack - 1)]
        return stack_to_obs(jnp.stack(hists + [frame])), None
    fresh = jnp.broadcast_to(frame[None],
                             (cfg.frame_stack,) + frame.shape)
    if reset_mode is True:
        stack = fresh
    else:
        rolled = jnp.concatenate([old_stack[1:], frame[None]], axis=0)
        stack = rolled if reset_mode is False else             jnp.where(reset_mode, fresh, rolled)
    return stack_to_obs(stack), stack


def _roll_hist(cfg: T.EnvConfig, new_state: EnvState,
               prev: EnvState) -> EnvState:
    """Shift the raw-grid history after a step: drop the oldest grid,
    append the PRE-step grid (cheap — grids are ~13x smaller than their
    encoded frames)."""
    if not _hist_mode(cfg):
        return new_state
    return new_state.replace(hist_grid=jnp.concatenate(
        [prev.hist_grid[1:], prev.grid[None]], axis=0))


def reset(cfg: T.EnvConfig, spawn, key: jnp.ndarray,
          spawn_cells=None, fruit_cells=None
          ) -> Tuple[EnvState, jnp.ndarray]:
    """Pure reset: sample a disjoint spawn combo, place fruits, encode obs.

    ``spawn`` is a ``spawn.SpawnData`` of jnp arrays. Replaces the
    reference's per-reset DFS + rejection loop
    (snake_env.py:131-159,576-589); see ``_reset_core`` for the key
    schedule (mirrored by the oracle) and the replay-mode
    ``spawn_cells``/``fruit_cells`` overrides.
    """
    state = _reset_core(cfg, spawn, key, spawn_cells, fruit_cells)
    obs, obs_stack = _encode_and_stack(cfg, state, None, True)
    if obs_stack is not None:
        state = state.replace(obs_stack=obs_stack)
    return state, obs


# ---------------------------------------------------------------------------
# step
# ---------------------------------------------------------------------------

def _step_core(cfg: T.EnvConfig, state: EnvState,
               actions: jnp.ndarray,
               fruit_cells=None, _defer_fruits: bool = False):
    """Step dynamics WITHOUT observation encoding (out.obs is an empty
    placeholder; obs_stack passes through). See :func:`step` /
    :func:`step_autoreset` for the public APIs. ``fruit_cells`` replaces
    the phase-7 PRNG respawn with captured reference draws (replay mode,
    see ``_reset_core``). With ``_defer_fruits`` the returned grid is
    PRE-fruit and ``(state, out, (u, fruit_taken))`` is returned — the
    PRNG draws are consumed identically either way."""
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    hw = h * w
    r_fruit, r_kill, r_lose, r_win, r_time = cfg.rewards
    grid = state.grid
    alive0 = state.alive
    idx_n = jnp.arange(n)

    # --- Phase 1: direction update + proposed heads ---
    new_dir = jnp.where(alive0, next_direction(cfg, state.direction,
                                               actions), state.direction)
    tgt = state.head + dir_delta(new_dir)  # (N, 2); interior-safe

    # --- Phase 2: collision vs pre-move grid ---
    # dense gather: (N, HW) one-hot dot beats a tiny dynamic gather on TPU
    # (u32-packing this gather like the vision window measured a LOSS,
    # 10.83M vs 11.53M headline round 4: the pack pass over the grid
    # does not fuse into the collision fusion the way the plain one-hot
    # select does, and the 0.7ms grid broadcast it targeted is cheaper
    # than a separate 400-element pack per env.)
    tgt_flat_idx = tgt[:, 0] * w + tgt[:, 1]
    tgt_onehot = tgt_flat_idx[:, None] == jnp.arange(hw)[None, :]
    tgt_cell = (jnp.where(tgt_onehot, grid.reshape(-1)[None, :], 0)
                ).sum(axis=1)
    tgt_type = T.cell_type(tgt_cell)
    tgt_owner = jnp.clip(T.cell_owner(tgt_cell), 0, n - 1)
    same_tgt = ((tgt[:, None, 0] == tgt[None, :, 0])
                & (tgt[:, None, 1] == tgt[None, :, 1])
                & alive0[:, None] & alive0[None, :])
    count = same_tgt.sum(1)
    multi = count >= 2
    deadly = ((tgt_type == T.WALL) | (tgt_type == T.BODY)
              | (tgt_type == T.HEAD))
    dies_collision = alive0 & (multi | deadly)
    # "primary" = lowest-index alive proposer of a target cell; mirrors the
    # reference's once-per-distinct-coord accounting (snake_env.py:526-541).
    shared_lower = (same_tgt & (idx_n[None, :] < idx_n[:, None])).any(1)
    primary = alive0 & ~shared_lower
    hit_snake = (tgt_type == T.BODY) | (tgt_type == T.HEAD)
    kill_credit = primary & hit_snake
    kills_delta = dense_add_1d(jnp.zeros((n,), jnp.float32), tgt_owner,
                               kill_credit.astype(jnp.float32))
    fruit_dead = primary & multi & (tgt_type == T.FRUIT)
    eats = alive0 & ~multi & ~deadly & (tgt_type == T.FRUIT)
    fruit_taken = (fruit_dead.sum() + eats.sum()).astype(jnp.int32)

    # --- Phase 3: tail-chase on an eater's old tail ---
    tail_eq = ((tgt[None, :, 0] == state.tail[:, None, 0])
               & (tgt[None, :, 1] == state.tail[:, None, 1]))
    chase = eats[:, None] & alive0[None, :] & tail_eq  # (eater f, chaser j)
    dies_chase = chase.any(0)
    kills_delta = kills_delta + chase.sum(1).astype(jnp.float32)
    # Reference decrements per chaser WITHOUT dedup against phase-2 deaths
    # (snake_env.py:334-346) — replicated on purpose.
    alive_count = (state.alive_count
                   - dies_collision.sum().astype(jnp.int32)
                   - chase.sum().astype(jnp.int32))
    dead_now = dies_collision | dies_chase
    alive1 = alive0 & ~dead_now

    # --- Phase 4: win flag ---
    # first alive snake ONLY (snake_env.py:347-352 breaks after one); the
    # counter can read 1 with several snakes alive (double-decrement quirk)
    prior_alive = (alive1[None, :] & (idx_n[None, :] < idx_n[:, None])).any(1)
    win = (alive_count == 1) & (n > 1) & alive1 & ~prior_alive

    # --- Phase 5: rewards ---
    was_dead = ~alive0
    rew = (r_time * alive1.astype(jnp.float32)
           + r_fruit * eats.astype(jnp.float32)
           + r_lose * dead_now.astype(jnp.float32)
           + r_kill * kills_delta
           + r_win * win.astype(jnp.float32))
    rew = jnp.where(was_dead, 0.0, rew)
    fruits_stat = jnp.where(was_dead, 0.0, eats.astype(jnp.float32))
    kills_stat = jnp.where(was_dead, 0.0, kills_delta)

    # --- Phase 6: grid update (masked writes in an order-equivalent order) --
    t_pre = T.cell_type(grid)
    owner_pre = T.cell_owner(grid)
    # cell erased iff its owner died now: per-env death BITMASK tested
    # with a per-cell shift — one (H, W) pass instead of an (N, H, W)
    # broadcast-compare-any (4.1ms -> ~1ms at 4096 envs in traces)
    dead_bits = (dead_now.astype(jnp.int32) << idx_n).sum()
    erase = (t_pre >= T.HEAD) & (((dead_bits >> owner_pre) & 1) > 0)
    flat = jnp.where(erase, T.EMPTY, grid).reshape(-1)

    head_flat = state.head[:, 0] * w + state.head[:, 1]
    tail_flat = state.tail[:, 0] * w + state.tail[:, 1]
    snake_ids = idx_n.astype(jnp.int32) << T.OWNER_SHIFT
    retract = alive1 & ~eats

    # body ring: push new head link, pop tail link when retracting
    ring, ring_head, ring_len = ring_push(
        state.ring, state.ring_head, state.ring_len, new_dir, alive1,
        cfg.body_capacity)
    popped, ring_len = ring_pop_tail(ring, ring_head, ring_len, retract,
                                     cfg.body_capacity)
    new_tail = jnp.where(retract[:, None],
                         state.tail + dir_delta(popped), state.tail)
    new_head = jnp.where(alive1[:, None], tgt, state.head)

    nh_flat = new_head[:, 0] * w + new_head[:, 1]
    nt_flat = new_tail[:, 0] * w + new_tail[:, 1]

    # The reference paints phase 6 sequentially per snake
    # (snake_env.py:358-374,546-566): old head -> BODY, retracting tail
    # -> EMPTY, new head -> HEAD, new tail -> TAIL. Here all four paints
    # ride ONE sum-reduce dense write (4N writers) — valid because the
    # game rules make the written cells pairwise DISJOINT for alive1
    # snakes except two pairs, which the masks below resolve to the
    # sequential outcome:
    #   * heads among alive1 are distinct (multi-head => all die); a
    #     mover onto any pre-move HEAD/BODY dies, so new heads never
    #     collide with old heads or (len>=3) new tails; a mover onto an
    #     EATER's tail dies (dies_chase), so new heads never collide
    #     with a kept tail; ownership is exclusive, so old heads / old
    #     tails / new tails are distinct across snakes and (len >= 2,
    #     delta != 0) within one.
    #   * length-2 retract: the new tail LANDS ON the own old head —
    #     sequentially TAIL overwrites BODY, so the old-head write is
    #     masked out there.
    #   * tail-chase onto a RETRACTING tail is safe: the mover's HEAD
    #     overwrites the tail erase — so the erase is masked where an
    #     alive mover claims the cell.
    # Measured: 3 vector passes + 1 scalar pass (~4.7ms incl. epilogue
    # fragments per 64 steps at 4096 envs) -> ONE 2.3ms select_reduce
    # fusion; headline 9.4M -> 9.9M steps/s. (The earlier concat+MAX
    # priority-bit merge XLA split into six reduce_max fusions and lost
    # — the sum form with mask-enforced disjointness is what fuses.)
    claimed_tail = (tail_eq & alive1[None, :]).any(1)
    oldhead_valid = alive1 & ~(retract & (nt_flat == head_flat))
    erase_tail_valid = retract & ~claimed_tail
    flat = dense_set_1d(
        flat,
        jnp.concatenate([head_flat, tail_flat, nh_flat, nt_flat]),
        jnp.concatenate([T.BODY + snake_ids,
                         jnp.full((n,), T.EMPTY, jnp.int32),
                         T.HEAD + snake_ids, T.TAIL + snake_ids]),
        jnp.concatenate([oldhead_valid, erase_tail_valid, alive1,
                         alive1]))
    grid = flat.reshape(h, w)

    # --- Phase 7: fruit respawn ---
    fruit_ctx = None
    if fruit_cells is not None:
        key = state.key
        grid = place_fruits_at(grid, fruit_cells)
    else:
        key, k_fruit = jax.random.split(state.key)
        u = jax.random.uniform(k_fruit, (n,))
        if _defer_fruits:
            fruit_ctx = (u, fruit_taken)
        else:
            grid = place_fruits(grid, u, fruit_taken)

    # --- Phase 8: stats / timeout / done / rank ---
    dones_pre = ~alive1
    mask = 1.0 - dones_pre.astype(jnp.float32)
    epi_scores = state.epi_scores + mask * rew
    epi_steps = state.epi_steps + mask
    epi_fruits = state.epi_fruits + mask * fruits_stat
    epi_kills = state.epi_kills + mask * kills_stat

    episode_length = state.episode_length + 1
    timeout = episode_length >= cfg.max_episode_steps
    dones = dones_pre | timeout
    if cfg.done_mode == 'any':
        done_all = dones.any()
        dones_out = jnp.broadcast_to(done_all, dones.shape) | dones
    else:
        done_all = dones.all()
        dones_out = dones

    # competition ("1224") ranking over accumulated scores
    # (snake_env.py:396-404)
    rank = 1 + (epi_scores[None, :] > epi_scores[:, None]).sum(1)

    out = StepOutput(
        obs=jnp.zeros((0,), jnp.uint8), reward=rew, done=dones_out,
        rank=rank.astype(jnp.int32),
        episode_scores=epi_scores, episode_steps=epi_steps,
        episode_fruits=epi_fruits, episode_kills=epi_kills,
        done_all=done_all,
    )

    zero = jnp.zeros_like(epi_scores)
    new_state = state.replace(
        grid=grid, direction=new_dir, head=new_head, tail=new_tail,
        ring=ring, ring_head=ring_head, ring_len=ring_len,
        alive=alive1, alive_count=alive_count,
        epi_scores=jnp.where(done_all, zero, epi_scores),
        epi_steps=jnp.where(done_all, zero, epi_steps),
        epi_fruits=jnp.where(done_all, zero, epi_fruits),
        epi_kills=jnp.where(done_all, zero, epi_kills),
        episode_length=episode_length,
        key=key,
    )
    if _defer_fruits:
        return new_state, out, fruit_ctx
    return new_state, out


def step(cfg: T.EnvConfig, state: EnvState,
         actions: jnp.ndarray,
         fruit_cells=None) -> Tuple[EnvState, StepOutput]:
    """One simultaneous-move step for all snakes (single env; vmap
    outside). ``fruit_cells`` enables reference-RNG replay (see
    ``_reset_core``)."""
    new_state, out = _step_core(cfg, state, actions, fruit_cells)
    new_state = _roll_hist(cfg, new_state, state)
    obs, obs_stack = _encode_and_stack(cfg, new_state, state.obs_stack,
                                       False)
    if obs_stack is not None:
        new_state = new_state.replace(obs_stack=obs_stack)
    return new_state, out.replace(obs=obs)


def step_autoreset(cfg: T.EnvConfig, spawn, state: EnvState,
                   actions: jnp.ndarray, reset_salt: int = 0x5EED
                   ) -> Tuple[EnvState, StepOutput]:
    """Step with fused auto-reset (single env; vmap outside).

    When the episode-done predicate fires, the returned state and obs are
    those of a freshly-reset env while rewards/dones/info still describe
    the finished step — the contract of the reference's fork-worker
    auto-reset (wrappers.py:141-143). Fusing the reset into the step lets
    the observation be encoded ONCE from the post-select state instead of
    once per branch — and fruits be placed ONCE on the done-selected grid
    with done-selected draws/count (branchwise identical to placing per
    branch then selecting, since ``place_fruits`` depends only on
    (grid, u, count); one empty-cell prefix-sum pass instead of two,
    measured ~2ms/64 steps at 4096 envs).
    """
    n = cfg.num_snakes
    nf = cfg.resolved_num_fruits
    new_state, out, (u_step, fruit_taken) = _step_core(
        cfg, state, actions, _defer_fruits=True)
    new_state = _roll_hist(cfg, new_state, state)
    rkey = jax.random.fold_in(new_state.key, reset_salt)
    r_state, u_reset = _reset_core(cfg, spawn, rkey, _defer_fruits=True)
    done = out.done_all

    # select every field except obs_stack (handled by _encode_and_stack)
    sel_state = jax.tree.map(
        lambda r, snew: jnp.where(done, r, snew),
        r_state.replace(obs_stack=new_state.obs_stack), new_state)

    # fused fruit placement: pad both branches' draws to one length
    # (padding lanes are masked by count inside place_fruits)
    m = max(n, nf)
    if m > 0:
        pad_s = jnp.zeros((m - n,), jnp.float32)
        pad_r = jnp.zeros((m - nf,), jnp.float32)
        u_sel = jnp.where(done, jnp.concatenate([u_reset, pad_r]),
                          jnp.concatenate([u_step, pad_s]))
        count_sel = jnp.where(done, jnp.int32(nf), fruit_taken)
        grid = place_fruits(sel_state.grid, u_sel, count_sel)
        sel_state = sel_state.replace(grid=grid)
        if _hist_mode(cfg):
            # a reset env's history replicates its own (post-fruit) grid
            sel_state = sel_state.replace(hist_grid=jnp.where(
                done, jnp.broadcast_to(grid[None],
                                       sel_state.hist_grid.shape),
                sel_state.hist_grid))
    obs, obs_stack = _encode_and_stack(cfg, sel_state, state.obs_stack,
                                       done)
    if obs_stack is not None:
        sel_state = sel_state.replace(obs_stack=obs_stack)
    return sel_state, out.replace(obs=obs)
