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


def use_grid_rays(cfg: T.EnvConfig) -> bool:
    """True when :func:`ray_features_from_grid` applies (obs is a pure
    function of the carried grid(s) and packed cells fit a byte).

    frame_stack > 1 is covered for FULL-OBS configs: the engine carries
    the fs-1 past grids (``engine._hist_mode``), so every stacked frame
    re-derives by the same byte-select. Vision configs with stacking
    carry encoded windows, not grids — those fall back."""
    if cfg.num_snakes > 16:
        return False
    return cfg.frame_stack == 1 or not cfg.vision_range


def _byte_select_cells(h, w, grid, rr, cc):
    """Byte-select of cells (rr, cc) from the u32-packed word plane of
    ``grid`` (the vision-window trick, engine.encode_frame_cropped);
    out-of-bounds -> 0 (EMPTY).

    Two UNROLLED chained-select passes (rows, then column words) over
    the static table axes — the round-5 unroll lesson: the previous
    flat (N, 5, v, H*W/4) one-hot + reduce materialized its
    intermediate (graph rollout 7.0M -> measured after switch in
    BENCH_TABLE)."""
    wp = -(-w // 4)
    gpad = jnp.pad(grid, ((0, 0), (0, wp * 4 - w))).astype(jnp.int32)
    words = sum(gpad[:, i::4] << (8 * i) for i in range(4))  # (H, wp)
    inb = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
    rsel = jnp.where(inb, rr, -1)
    tmp = jnp.zeros(rr.shape + (wp,), jnp.int32)   # (N, 5, v, wp)
    for hh in range(h):
        tmp = jnp.where((rsel == hh)[..., None], words[hh], tmp)
    cw = cc >> 2
    word = jnp.zeros(rr.shape, jnp.int32)
    for pp in range(wp):
        word = jnp.where(cw == pp, tmp[..., pp], word)
    return (word >> ((cc & 3) * 8)) & 0xFF                   # (N, 5, v)


def _encode_ray_vals(n, cell):
    """Channel-encode selected cells in place -> (N, 5, v, 8) float32:
    shared packed byte + bit unpack (the engine.encode_frame form —
    bit-identical, ~2 ops per output element)."""
    t = T.cell_type(cell)
    owner = T.cell_owner(cell)
    shift = jnp.where(t == T.WALL, 0,
                      jnp.where(t == T.FRUIT, 1, 2 + (t - T.HEAD)))
    base = jnp.where(t > T.EMPTY, (1 << shift), 0)
    ids = jnp.arange(n).reshape(n, 1, 1)
    is_mine = (t >= T.HEAD) & (owner == ids)
    byte = jnp.where(is_mine, base << 3, base)
    c = jnp.arange(T.FEATURE_CHANNEL).reshape(1, 1, 1, -1)
    return ((byte[..., None] >> c) & 1).astype(jnp.float32)


def ray_features_from_grid(cfg: T.EnvConfig, grid: jnp.ndarray,
                           head: jnp.ndarray, direction: jnp.ndarray,
                           alive: jnp.ndarray,
                           hist_grid: jnp.ndarray = None) -> jnp.ndarray:
    """Bit-identical to ``ray_features`` over the encoded obs — derived
    straight from the carried GRID(s).

    The obs-indexing form lowers to a serialized kCustom dynamic gather
    on TPU (the graph rollout measured 293k env-steps/s, ~40x below the
    grid rollout, with that gather dominating). Here the ~25 ray cells
    are one-hot byte-selected from the u32-packed grid plane (the
    vision-window trick, engine.encode_frame_cropped) and
    channel-encoded in place; the (N, H, W, 8*fs) obs is never read, so
    the graph env's obs encode is dead-code-eliminated entirely.

    ``frame_stack > 1`` (full-obs): ``hist_grid`` is the engine's
    carried (fs-1, H, W) raw-grid history (oldest first,
    engine._roll_hist) — every stacked frame byte-selects the SAME ray
    cells from its own grid and the channel blocks concatenate
    frame-major, exactly like engine.stack_to_obs. The wall-stop test
    reads the stacked obs' channel 0 (= the OLDEST frame's wall plane,
    the literal ``ray_features`` formula); walls are static within an
    episode and a reset state's history replicates its own grid, so
    this matches every frame's walls. Requires num_snakes <= 16 (packed
    cells must fit a byte); callers fall back to ``ray_features``
    otherwise or for vision configs with stacking (their carry holds
    encoded windows, not grids). Equality proven per config in
    tests/test_ops.py.
    """
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range if cfg.vision_range else 5

    left = (direction - 1) % 4
    right = (direction + 1) % 4
    card = jnp.stack([direction, left, right], axis=1)
    card_d = jnp.asarray(_DIR_DELTA)[card]
    diag_d = jnp.stack([card_d[:, 0] + card_d[:, 1],
                        card_d[:, 0] + card_d[:, 2]], axis=1)
    all_d = jnp.concatenate([card_d, diag_d], axis=1)        # (N, 5, 2)

    steps = jnp.arange(1, v + 1)
    off = all_d[:, :, None, :] * steps[None, None, :, None]  # (N, 5, v, 2)
    if cfg.vision_range:
        # obs space is the (2v+1)^2 window: clip in WINDOW coords, then
        # map to absolute cells via the (possibly off-grid) window base;
        # out-of-grid cells read 0 = EMPTY like the zero-padded crop
        vr = cfg.vision_range
        anchor = jnp.where(alive[:, None], head, 0)
        wr = jnp.clip(vr + off[..., 0], 0, 2 * vr)
        wc = jnp.clip(vr + off[..., 1], 0, 2 * vr)
        rr = anchor[:, 0, None, None] - vr + wr
        cc = anchor[:, 1, None, None] - vr + wc
    else:
        rr = jnp.clip(head[:, 0, None, None] + off[..., 0], 0, h - 1)
        cc = jnp.clip(head[:, 1, None, None] + off[..., 1], 0, w - 1)

    frames = []
    if cfg.frame_stack > 1:
        for i in range(cfg.frame_stack - 1):
            frames.append(hist_grid[i])
    frames.append(grid)
    cells = [_byte_select_cells(h, w, g, rr, cc) for g in frames]
    vals = jnp.concatenate([_encode_ray_vals(n, c) for c in cells],
                           axis=-1)                 # (N, 5, v, 8*fs)

    # wall-stop gate: channel 0 of the stacked obs = OLDEST frame's wall
    wall_hit = T.cell_type(cells[0]) == T.WALL
    prior_wall = (jnp.cumsum(wall_hit, axis=-1) - wall_hit) > 0
    include = (~prior_wall).astype(jnp.float32)
    inv = 1.0 / steps.astype(jnp.float32)
    wgt = jnp.concatenate([
        jnp.broadcast_to(inv, (3, v)),
        jnp.broadcast_to(inv / math.sqrt(2.0), (2, v)),
    ], axis=0)
    feats = (vals * (include * wgt[None])[..., None]).sum(axis=2)
    return jnp.where(alive[:, None, None], feats, 0.0)
