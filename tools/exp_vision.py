"""Vision-window encode experiments (historical variant matrix).

Measures full-rollout throughput (bench.build_rollout, vision_range=5)
with alternative implementations of ``encode_frame_cropped`` monkeypatched
into the engine. Each variant is bit-checked against the baseline on a
small batch first.

NOTE (round 5): the shipped engine form moved PAST every variant here —
the two window passes are now UNROLLED chained selects over the static
row/word axes and the channel encode is a shared-byte bit unpack
(engine.encode_frame_cropped; vision5 9.2M at this matrix's baseline ->
18.0M). The rows below remain the recorded round-3/4 comparisons that
picked the then-best W-packed select+reduce form.

Usage: python tools/exp_vision.py [variant ...]   (default: all)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from marlsnake_tpu.core import engine
from marlsnake_tpu.core import types as T
from marlsnake_tpu.core.types import EnvConfig

BASELINE = engine.encode_frame_cropped


def _channels(win, n):
    """Shared elementwise channel encode of a gathered int window."""
    t = T.cell_type(win)
    owner = T.cell_owner(win)
    ids = jnp.arange(n).reshape(n, 1, 1, 1)
    mine = owner[..., None] == ids
    tt = t[..., None]
    c = jnp.arange(T.FEATURE_CHANNEL).reshape(1, 1, 1, -1)
    env_hit = (c <= 1) & (tt == c + 1)
    snake_part = (tt >= T.HEAD) & ((c - 2) % 3 == tt - T.HEAD)
    snake_hit = snake_part & ((c >= 5) == mine) & (c >= 2)
    return (env_hit | snake_hit).astype(jnp.uint8)


def v_packed(cfg, grid, head, alive):
    """Encode the full grid to 8 channel bits packed into one f32 per
    cell PER SNAKE, window the packed plane with the same two one-hot
    einsums, then unpack bits."""
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range
    v2 = 2 * v + 1
    frame = engine.encode_frame(cfg, grid)  # (N, H, W, 8) u8
    weights = (1 << jnp.arange(T.FEATURE_CHANNEL)).astype(jnp.int32)
    packed = (frame.astype(jnp.int32) * weights).sum(-1).astype(jnp.float32)
    center = jnp.where(alive[:, None], head, 0)
    ry = center[:, 0, None] + jnp.arange(v2) - v
    cx = center[:, 1, None] + jnp.arange(v2) - v
    ry_oh = (ry[:, :, None] == jnp.arange(h)).astype(jnp.float32)
    cx_oh = (cx[:, :, None] == jnp.arange(w)).astype(jnp.float32)
    tmp = jnp.einsum('nyh,nhw->nyw', ry_oh, packed)
    win = jnp.einsum('nxw,nyw->nyx', cx_oh, tmp).astype(jnp.int32)
    c = jnp.arange(T.FEATURE_CHANNEL).reshape(1, 1, 1, -1)
    return ((win[..., None] >> c) & 1).astype(jnp.uint8)


def v_colfirst(cfg, grid, head, alive):
    """Baseline with the contraction order swapped (columns first)."""
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range
    v2 = 2 * v + 1
    center = jnp.where(alive[:, None], head, 0)
    ry = center[:, 0, None] + jnp.arange(v2) - v
    cx = center[:, 1, None] + jnp.arange(v2) - v
    ry_oh = (ry[:, :, None] == jnp.arange(h)).astype(jnp.float32)
    cx_oh = (cx[:, :, None] == jnp.arange(w)).astype(jnp.float32)
    tmp = jnp.einsum('nxw,hw->nxh', cx_oh, grid.astype(jnp.float32))
    win = jnp.einsum('nyh,nxh->nyx', ry_oh, tmp).astype(jnp.int32)
    return _channels(win, n)


def v_flat_onehot(cfg, grid, head, alive):
    """Single flat-cell one-hot contraction: win = onehot(idx) @ flat."""
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range
    v2 = 2 * v + 1
    center = jnp.where(alive[:, None], head, 0)
    ry = center[:, 0, None] + jnp.arange(v2) - v          # (N, y)
    cx = center[:, 1, None] + jnp.arange(v2) - v          # (N, x)
    inb = ((ry >= 0) & (ry < h))[:, :, None] & \
          ((cx >= 0) & (cx < w))[:, None, :]
    idx = jnp.where(inb, ry[:, :, None] * w + cx[:, None, :], -1)
    oh = (idx[..., None] == jnp.arange(h * w)).astype(jnp.float32)
    win = jnp.einsum('nyxF,F->nyx', oh,
                     grid.reshape(-1).astype(jnp.float32)).astype(jnp.int32)
    return _channels(win, n)


def v_transposed_out(cfg, grid, head, alive):
    """Baseline einsums but emit (N, x, y) then one explicit transpose,
    giving XLA a different layout seam to fuse through."""
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range
    v2 = 2 * v + 1
    center = jnp.where(alive[:, None], head, 0)
    ry = center[:, 0, None] + jnp.arange(v2) - v
    cx = center[:, 1, None] + jnp.arange(v2) - v
    ry_oh = (ry[:, :, None] == jnp.arange(h)).astype(jnp.float32)
    cx_oh = (cx[:, :, None] == jnp.arange(w)).astype(jnp.float32)
    tmp = jnp.einsum('nyh,hw->nyw', ry_oh, grid.astype(jnp.float32))
    win_t = jnp.einsum('nyw,nxw->nxy', tmp, cx_oh).astype(jnp.int32)
    return _channels(jnp.swapaxes(win_t, 1, 2), n)


def v_colfirst_bf16(cfg, grid, head, alive):
    """colfirst with bf16 one-hot contractions (MXU bf16 is 2x f32;
    cell values < 128 and one-hot sums are exact in bf16)."""
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range
    v2 = 2 * v + 1
    center = jnp.where(alive[:, None], head, 0)
    ry = center[:, 0, None] + jnp.arange(v2) - v
    cx = center[:, 1, None] + jnp.arange(v2) - v
    ry_oh = (ry[:, :, None] == jnp.arange(h)).astype(jnp.bfloat16)
    cx_oh = (cx[:, :, None] == jnp.arange(w)).astype(jnp.bfloat16)
    tmp = jnp.einsum('nxw,hw->nxh', cx_oh, grid.astype(jnp.bfloat16),
                     preferred_element_type=jnp.bfloat16)
    win = jnp.einsum('nyh,nxh->nyx', ry_oh, tmp,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    return _channels(win, n)


def v_rowfirst_bf16(cfg, grid, head, alive):
    """Baseline contraction order, bf16 operands."""
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range
    v2 = 2 * v + 1
    center = jnp.where(alive[:, None], head, 0)
    ry = center[:, 0, None] + jnp.arange(v2) - v
    cx = center[:, 1, None] + jnp.arange(v2) - v
    ry_oh = (ry[:, :, None] == jnp.arange(h)).astype(jnp.bfloat16)
    cx_oh = (cx[:, :, None] == jnp.arange(w)).astype(jnp.bfloat16)
    tmp = jnp.einsum('nyh,hw->nyw', ry_oh, grid.astype(jnp.bfloat16),
                     preferred_element_type=jnp.bfloat16)
    win = jnp.einsum('nxw,nyw->nyx', cx_oh, tmp,
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    return _channels(win, n)


def v_colfirst_elem(cfg, grid, head, alive):
    """colfirst contraction order but as fused elementwise
    where+reduce instead of matmuls (no MXU, no layout seams)."""
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range
    v2 = 2 * v + 1
    center = jnp.where(alive[:, None], head, 0)
    ry = center[:, 0, None] + jnp.arange(v2) - v
    cx = center[:, 1, None] + jnp.arange(v2) - v
    # tmp[n, x, h] = grid[h, cx[n, x]]
    sel_c = cx[:, :, None, None] == jnp.arange(w)          # (N, x, 1, W)
    tmp = jnp.where(sel_c, grid[None, None], 0).sum(-1)    # (N, x, H)
    sel_r = ry[:, None, :, None] == jnp.arange(h)          # (N, 1, y, H)
    win = jnp.where(sel_r, tmp[:, :, None, :], 0).sum(-1)  # (N, x, y)
    return _channels(jnp.swapaxes(win, 1, 2), n)


def v_rowfirst_elem(cfg, grid, head, alive):
    """Elementwise where+reduce, rows first, output directly (N, y, x)
    (no transpose at all)."""
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range
    v2 = 2 * v + 1
    center = jnp.where(alive[:, None], head, 0)
    ry = center[:, 0, None] + jnp.arange(v2) - v
    cx = center[:, 1, None] + jnp.arange(v2) - v
    # tmp[n, y, w] = grid[ry[n, y], w]
    sel_r = ry[:, :, None, None] == jnp.arange(h)[:, None]  # (N, y, H, 1)
    tmp = jnp.where(sel_r, grid[None, None], 0).sum(2)      # (N, y, W)
    sel_c = cx[:, None, :, None] == jnp.arange(w)           # (N, 1, x, W)
    win = jnp.where(sel_c, tmp[:, :, None, :], 0).sum(-1)   # (N, y, x)
    return _channels(win, n)


def v_rowfirst_elem_i8(cfg, grid, head, alive):
    """rowfirst_elem with int16 intermediates (grid values < 2^7 but
    cell = type + 10*idx can reach 10n+5; int16 is safe for any n)."""
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range
    v2 = 2 * v + 1
    g16 = grid.astype(jnp.int16)
    center = jnp.where(alive[:, None], head, 0)
    ry = center[:, 0, None] + jnp.arange(v2) - v
    cx = center[:, 1, None] + jnp.arange(v2) - v
    sel_r = ry[:, :, None, None] == jnp.arange(h)[:, None]
    tmp = jnp.where(sel_r, g16[None, None], 0).sum(2)
    sel_c = cx[:, None, :, None] == jnp.arange(w)
    win = jnp.where(sel_c, tmp[:, :, None, :], 0).sum(-1)
    return _channels(win.astype(jnp.int32), n)


def _pack_w(grid, w):
    """Pack 4 u8 cells along W into one LE u32 word (cells fit a byte for
    num_snakes <= 15: type|owner<<4, types.py). Applies the spawn-blob
    insight (CLAUDE.md): dense compare+select cost scales with ELEMENT
    count, so a 4x-narrower word plane cuts both gather passes."""
    wp = (w + 3) // 4
    gpad = jnp.pad(grid, ((0, 0), (0, wp * 4 - w))).astype(jnp.int32)
    return sum(gpad[:, i::4] << (8 * i) for i in range(4)), wp


def v_u32pack_rowfirst(cfg, grid, head, alive):
    """Both one-hot passes run on the 4x-narrower u32 word plane (W-axis
    packing survives both reductions as the minor dim); single byte
    shift+mask unpack at the final (N, y, x) window. Out-of-range cx
    gives word index cx>>2 = -1 (arithmetic shift) or >= wp -> no match
    -> 0 -> EMPTY, same as the baseline's out-of-grid behavior."""
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range
    v2 = 2 * v + 1
    words, wp = _pack_w(grid, w)                            # (H, wp)
    center = jnp.where(alive[:, None], head, 0)
    ry = center[:, 0, None] + jnp.arange(v2) - v            # (N, y)
    cx = center[:, 1, None] + jnp.arange(v2) - v            # (N, x)
    # tmp[n, y, p] = words[ry[n, y], p]
    sel_r = ry[:, :, None, None] == jnp.arange(h)[:, None]  # (N, y, H, 1)
    tmp = jnp.where(sel_r, words[None, None], 0).sum(2)     # (N, y, wp)
    cw = cx >> 2
    sel_c = cw[:, None, :, None] == jnp.arange(wp)          # (N, 1, x, wp)
    winw = jnp.where(sel_c, tmp[:, :, None, :], 0).sum(-1)  # (N, y, x)
    win = (winw >> ((cx & 3) * 8)[:, None, :]) & 0xFF
    return _channels(win, n)


def v_u32pack_colfirst(cfg, grid, head, alive):
    """u32-packed words, column(word)-select first then rows (the
    baseline's pass order); unpack after both reductions."""
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range
    v2 = 2 * v + 1
    words, wp = _pack_w(grid, w)                            # (H, wp)
    center = jnp.where(alive[:, None], head, 0)
    ry = center[:, 0, None] + jnp.arange(v2) - v
    cx = center[:, 1, None] + jnp.arange(v2) - v
    cw = cx >> 2
    # tmp[n, x, h] = words[h, cw[n, x]]
    sel_c = cw[:, :, None, None] == jnp.arange(wp)          # (N, x, 1, wp)
    tmp = jnp.where(sel_c, words[None, None], 0).sum(-1)    # (N, x, H)
    sel_r = ry[:, None, :, None] == jnp.arange(h)           # (N, 1, y, H)
    winw = jnp.swapaxes(
        jnp.where(sel_r, tmp[:, :, None, :], 0).sum(-1), 1, 2)  # (N, y, x)
    win = (winw >> ((cx & 3) * 8)[:, None, :]) & 0xFF
    return _channels(win, n)


def _channels_palette(p, n):
    """Channel encode directly from PALETTE indices (p = type + 3*owner,
    exact for env cells since their owner bits are 0; max 14 for n=4)."""
    c = jnp.arange(T.FEATURE_CHANNEL).reshape(1, 1, 1, -1)
    pp = p[..., None]
    env_hit = (c <= 1) & (pp == c + 1)
    q = pp - T.HEAD
    part = q % 3
    owner = q // 3
    ids = jnp.arange(n).reshape(n, 1, 1, 1)
    mine = owner == ids
    snake_hit = ((pp >= T.HEAD) & ((c - 2) % 3 == part)
                 & ((c >= 5) == mine) & (c >= 2))
    return (env_hit | snake_hit).astype(jnp.uint8)


def v_nib8_rowfirst(cfg, grid, head, alive):
    """4-bit PALETTE packing, 8 cells per u32 word along W (n <= 4:
    palette p = type + 3*owner <= 14 fits a nibble) — both one-hot
    passes run on an 8x-narrower word plane (wp8 = ceil(W/8)); nibble
    extract + palette channel-decode at the final (N, y, x) window."""
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range
    v2 = 2 * v + 1
    t = (grid & T.TYPE_MASK)
    pal = t + 3 * (grid >> T.OWNER_SHIFT)                   # (H, W) <= 14
    wp8 = (w + 7) // 8
    gpad = jnp.pad(pal, ((0, 0), (0, wp8 * 8 - w))).astype(jnp.int32)
    words = sum(gpad[:, i::8] << (4 * i) for i in range(8))  # (H, wp8)
    center = jnp.where(alive[:, None], head, 0)
    ry = center[:, 0, None] + jnp.arange(v2) - v            # (N, y)
    cx = center[:, 1, None] + jnp.arange(v2) - v            # (N, x)
    sel_r = ry[:, :, None, None] == jnp.arange(h)[:, None]  # (N, y, H, 1)
    tmp = jnp.where(sel_r, words[None, None], 0).sum(2)     # (N, y, wp8)
    cw = cx >> 3
    sel_c = cw[:, None, :, None] == jnp.arange(wp8)         # (N, 1, x, wp8)
    winw = jnp.where(sel_c, tmp[:, :, None, :], 0).sum(-1)  # (N, y, x)
    p = (winw >> ((cx & 7) * 4)[:, None, :]) & 0xF
    return _channels_palette(p, n)


def v_hwords(cfg, grid, head, alive):
    """Byte-select from H-words: pack 4 CONSECUTIVE rows per u32 along H,
    select only the <=4 word-rows the 11-row window can span (row
    consecutiveness), column-select, then per-y word+byte expand."""
    n = cfg.num_snakes
    h, w = cfg.height, cfg.width
    v = cfg.vision_range
    v2 = 2 * v + 1
    hp = (h + 3) // 4
    gpad = jnp.pad(grid, ((0, hp * 4 - h), (0, 0))).astype(jnp.int32)
    wordsH = sum(gpad[j::4] << (8 * j) for j in range(4))   # (hp, W)
    center = jnp.where(alive[:, None], head, 0)
    ry0 = center[:, 0] - v                                  # (N,)
    cx = center[:, 1, None] + jnp.arange(v2) - v            # (N, x)
    nq = (v2 + 3) // 4 + 1                                  # word-rows spanned
    # pass 1: tmpA[n, q, c] = wordsH[rw0+q, c]
    rw = (ry0 >> 2)[:, None] + jnp.arange(nq)               # (N, q)
    selq = rw[:, :, None, None] == jnp.arange(hp)[:, None]  # (N, q, hp, 1)
    tmpA = jnp.where(selq, wordsH[None, None], 0).sum(2)    # (N, q, W)
    # pass 2: tmpB[n, q, x] = tmpA[n, q, cx[n, x]]
    selc = cx[:, None, :, None] == jnp.arange(w)            # (N, 1, x, W)
    tmpB = jnp.where(selc, tmpA[:, :, None, :], 0).sum(-1)  # (N, q, x)
    # pass 3: win[n, y, x] = byte by of tmpB[n, qy, x]
    off = (ry0 & 3)[:, None] + jnp.arange(v2)               # (N, y) 0..14
    qy = off >> 2
    by = off & 3
    selq2 = qy[:, :, None, None] == jnp.arange(nq)          # (N, y, 1, q)
    winw = jnp.where(selq2, jnp.swapaxes(tmpB, 1, 2)[:, None],
                     0).sum(-1)                             # (N, y, x)
    win = (winw >> (8 * by)[:, :, None]) & 0xFF
    return _channels(win, n)


VARIANTS = {
    'nib8_rowfirst': v_nib8_rowfirst,
    'hwords': v_hwords,
    'baseline': BASELINE,
    'u32pack_rowfirst': v_u32pack_rowfirst,
    'u32pack_colfirst': v_u32pack_colfirst,
    'packed': v_packed,
    'colfirst': v_colfirst,
    'flat_onehot': v_flat_onehot,
    'transposed_out': v_transposed_out,
    'colfirst_bf16': v_colfirst_bf16,
    'rowfirst_bf16': v_rowfirst_bf16,
    'colfirst_elem': v_colfirst_elem,
    'rowfirst_elem': v_rowfirst_elem,
    'rowfirst_elem_i8': v_rowfirst_elem_i8,
}


def check(fn, cfg):
    """Bit-check variant vs baseline on a small random batch (CPU-ok).

    Cells are drawn VALID (type <= TAIL, owner < num_snakes) — real grids
    never contain other codes, and palette-packed variants rely on that.
    """
    key = jax.random.key(0)
    t = jax.random.randint(key, (cfg.height, cfg.width), 0, 6)
    o = jax.random.randint(jax.random.key(7), (cfg.height, cfg.width),
                           0, cfg.num_snakes)
    grid = t + (jnp.where(t >= T.HEAD, o, 0) << T.OWNER_SHIFT)
    head = jax.random.randint(jax.random.key(1), (cfg.num_snakes, 2), 0,
                              cfg.height)
    alive = jnp.array([True, True, False, True])
    a = BASELINE(cfg, grid, head, alive)
    b = fn(cfg, grid, head, alive)
    assert (a == b).all(), 'variant mismatch'


def measure(name, fn, num_envs=4096, num_steps=256, iters=3):
    from bench import build_rollout
    engine.encode_frame_cropped = fn
    try:
        cfg = EnvConfig(height=20, width=20, num_snakes=4, snake_length=3,
                        vision_range=5)
        check(fn, cfg)
        init, rollout = build_rollout(cfg, num_envs, num_steps)
        states = init(jax.random.key(0))
        states, r = rollout(states, jax.random.key(1))
        r.block_until_ready()
        t0 = time.perf_counter()
        for i in range(iters):
            states, r = rollout(states, jax.random.key(2 + i))
        r.block_until_ready()
        dt = time.perf_counter() - t0
        sps = num_envs * num_steps * iters / dt
        print(f'{name:16s} {sps/1e6:8.2f} M env-steps/s')
        return sps
    finally:
        engine.encode_frame_cropped = BASELINE


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        measure(name, VARIANTS[name])


if __name__ == '__main__':
    main()
