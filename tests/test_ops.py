"""Unit tests for ops: flood fill, dense scatter, ray features."""

import math
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlsnake_tpu.core import types as T
from marlsnake_tpu.ops.floodfill import reachable_count
from marlsnake_tpu.ops.scatter import dense_add_1d, dense_set_1d
from marlsnake_tpu.ops.rays import ray_features
from marlsnake_tpu.core.types import EnvConfig


def bfs_count(passable, start, limit=60):
    """Reference-style count-capped BFS (train_dqn.py:444-461)."""
    q = deque([tuple(start)])
    visited = {tuple(start)}
    count = 0
    h, w = passable.shape
    while q and count < limit:
        y, x = q.popleft()
        count += 1
        for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
            ny, nx = y + dy, x + dx
            if (0 <= ny < h and 0 <= nx < w and (ny, nx) not in visited
                    and passable[ny, nx]):
                visited.add((ny, nx))
                q.append((ny, nx))
    return count


@pytest.mark.parametrize('seed', range(8))
def test_floodfill_matches_bfs(seed):
    rng = np.random.default_rng(seed)
    passable = rng.random((12, 12)) > 0.35
    start = (rng.integers(12), rng.integers(12))
    got = int(reachable_count(jnp.asarray(passable),
                              jnp.asarray(start), limit=60))
    want = bfs_count(passable, start, limit=60)
    assert got == want


def test_floodfill_cap():
    passable = np.ones((20, 20), bool)
    got = int(reachable_count(jnp.asarray(passable),
                              jnp.asarray((10, 10)), limit=60))
    assert got == 60


def test_dense_set_1d_disjoint_and_valid():
    arr = jnp.zeros(10, jnp.int32)
    out = dense_set_1d(arr, jnp.asarray([2, 7, 5]),
                       jnp.asarray([7, 9, 3]),
                       jnp.asarray([True, True, False]))
    assert out[2] == 7 and out[7] == 9 and out[5] == 0 and out.sum() == 16


def test_dense_set_1d_scalar_duplicates():
    # scalar values tolerate duplicate indices (with-replacement fruit
    # draws collapse into one write of the same value)
    arr = jnp.zeros(10, jnp.int32)
    out = dense_set_1d(arr, jnp.asarray([2, 2, 5]), 4,
                       jnp.asarray([True, True, True]))
    assert out[2] == 4 and out[5] == 4 and out.sum() == 8


def test_dense_add_accumulates():
    out = dense_add_1d(jnp.zeros(4), jnp.asarray([1, 1, 3]),
                       jnp.asarray([1.0, 2.0, 5.0]))
    np.testing.assert_allclose(np.asarray(out), [0, 3, 0, 5])


def _ray_reference(cfg, obs, head, direction, alive):
    """Independent numpy replica of graph_snake_env._process_obs
    (per-snake rows, not the compacted reference layout)."""
    n, H, W, C = obs.shape
    v = cfg.vision_range if cfg.vision_range else 5
    out = np.zeros((n, 5, C))
    angle_map = {0: 0.0, 1: math.pi / 2, 2: -math.pi / 2}
    for s in range(n):
        if not alive[s]:
            continue
        d = T.DIR_DELTA[direction[s]]
        angle = math.atan2(d[1], d[0])
        hd = (v, v) if cfg.vision_range else tuple(head[s])
        dirs = []
        for a in range(3):
            dirs.append((int(math.cos(angle + angle_map[a])),
                         int(math.sin(angle + angle_map[a]))))
        rows = []
        for a in range(3):
            acc = np.zeros(C)
            for i in range(v):
                cell = obs[s][hd[0] + dirs[a][0] * (i + 1),
                              hd[1] + dirs[a][1] * (i + 1)]
                acc += cell / (i + 1)
                if cell[0] == 1:
                    break
            rows.append(acc)
        for pair in [(0, 1), (0, 2)]:
            dd = (dirs[pair[0]][0] + dirs[pair[1]][0],
                  dirs[pair[0]][1] + dirs[pair[1]][1])
            acc = np.zeros(C)
            for i in range(v):
                cell = obs[s][hd[0] + dd[0] * (i + 1),
                              hd[1] + dd[1] * (i + 1)]
                acc += cell / ((i + 1) * math.sqrt(2))
                if cell[0] == 1:
                    break
            rows.append(acc)
        out[s] = np.stack(rows)
    return out


@pytest.mark.parametrize('seed', [0, 3])
def test_ray_features_match_reference_loop(seed):
    import jax
    from marlsnake_tpu.envs.env import make_env
    cfg = EnvConfig(height=12, width=12, num_snakes=3, snake_length=3,
                    num_fruits=3)
    env = make_env(cfg)
    state, obs = env.reset(jax.random.key(seed))
    rng = np.random.default_rng(seed)
    for _ in range(10):
        state, out = env.step(state,
                              jnp.asarray(rng.integers(0, 3, size=3)))
    got = np.asarray(ray_features(cfg, out.obs, state.head,
                                  state.direction, state.alive))
    want = _ray_reference(cfg, np.asarray(out.obs), np.asarray(state.head),
                          np.asarray(state.direction),
                          np.asarray(state.alive))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_direction_arithmetic_matches_tables():
    """engine.next_direction / engine.dir_delta are bit-equal to the
    TURN_SNAKE / TURN_HUMAN / DIR_DELTA tables they replaced (the
    arithmetic forms avoid slow tiny-table gathers on TPU)."""
    from marlsnake_tpu.core import engine
    dirs = jnp.arange(4)
    acts = jnp.arange(5)
    d_grid, a_grid = jnp.meshgrid(dirs, acts, indexing='ij')
    for observer, table in (('snake', T.TURN_SNAKE),
                            ('human', T.TURN_HUMAN)):
        cfg = EnvConfig(observer=observer)
        got = engine.next_direction(cfg, d_grid.ravel(), a_grid.ravel())
        np.testing.assert_array_equal(np.asarray(got).reshape(4, 5), table)
    np.testing.assert_array_equal(np.asarray(engine.dir_delta(dirs)),
                                  T.DIR_DELTA)


@pytest.mark.parametrize('n,h,w', [(4, 20, 20), (15, 30, 30), (16, 20, 20),
                                   (3, 10, 14)])
def test_encode_frame_cropped_matches_padded_crop(n, h, w):
    """The windowed encode (u32-packed word gather for n<=15, unpacked
    fallback above) must equal a zero-padded numpy crop of the
    full-frame encode at each snake's head, with the dead-snake (0, 0)
    anchor quirk (reference snake_env.py:497-517)."""
    from marlsnake_tpu.core import engine

    v = 4
    cfg = EnvConfig(height=h, width=w, num_snakes=n, snake_length=3,
                    vision_range=v)
    rng = np.random.default_rng(n * 100 + w)
    # synthetic packed cells: any type 0..5, any owner 0..n-1
    grid = jnp.asarray(T.pack_cell(rng.integers(0, 6, (h, w)),
                                   rng.integers(0, n, (h, w))), jnp.int32)
    head = jnp.asarray(rng.integers(0, min(h, w), (n, 2)), jnp.int32)
    alive = jnp.asarray(rng.integers(0, 2, (n,)).astype(bool))

    got = np.asarray(engine.encode_frame_cropped(cfg, grid, head, alive))

    full = np.asarray(engine.encode_frame(cfg, grid))  # (N, H, W, 8)
    v2 = 2 * v + 1
    want = np.zeros((n, v2, v2, full.shape[-1]), np.uint8)
    for s in range(n):
        cy, cx = (tuple(np.asarray(head[s])) if bool(alive[s]) else (0, 0))
        for dy in range(-v, v + 1):
            for dx in range(-v, v + 1):
                y, x = cy + dy, cx + dx
                if 0 <= y < h and 0 <= x < w:
                    want[s, dy + v, dx + v] = full[s, y, x]
    np.testing.assert_array_equal(got, want)


def test_packed_ring_roundtrip_across_word_boundaries():
    """2-bit-packed ring ops == a plain per-slot deque model through
    pushes/pops that wrap words (cap > 16) and the ring itself."""
    import numpy as np
    from marlsnake_tpu.core.state import (
        ring_num_words, ring_pack_prefix, ring_push, ring_pop_tail,
        ring_slots, tail_direction)

    cap = 37  # 3 words, non-multiple of 16
    n = 3
    rng = np.random.default_rng(0)
    dirs0 = jnp.asarray(rng.integers(0, 4, size=(n, 2)), jnp.int32)
    ring = ring_pack_prefix(dirs0, cap)
    assert ring.shape == (n, ring_num_words(cap))
    head = jnp.zeros((n,), jnp.int32)
    length = jnp.full((n,), 2, jnp.int32)

    # host model: list per snake, newest first
    model = [list(map(int, np.asarray(dirs0)[i])) for i in range(n)]

    for step in range(60):
        d = jnp.asarray(rng.integers(0, 4, size=(n,)), jnp.int32)
        push_mask = jnp.asarray(rng.random(n) < 0.9)
        ring, head, length = ring_push(ring, head, length, d, push_mask,
                                       cap)
        for i in range(n):
            if bool(push_mask[i]):
                model[i].insert(0, int(d[i]))
        # oldest-link read must match before popping
        tails = np.asarray(tail_direction(ring, head, length, cap))
        for i in range(n):
            assert tails[i] == model[i][-1], (step, i)
        pop_mask = jnp.asarray(rng.random(n) < 0.7) & (length > 1)
        popped, length = ring_pop_tail(ring, head, length, pop_mask, cap)
        for i in range(n):
            if bool(pop_mask[i]):
                assert int(popped[i]) == model[i].pop(), (step, i)
        # full unpacked window equals the model
        slots = np.asarray(ring_slots(ring, cap))
        for i in range(n):
            h0, ln = int(head[i]), int(length[i])
            window = [slots[i][(h0 + j) % cap] for j in range(ln)]
            assert window == model[i], (step, i)


@pytest.mark.parametrize('cfg_kw', [
    dict(height=12, width=12, num_snakes=4, snake_length=3),
    dict(height=13, width=11, num_snakes=3, snake_length=3,
         vision_range=4),
    dict(height=20, width=20, num_snakes=4, snake_length=3,
         vision_range=5),
    # frame_stack > 1 (full obs): rays over the raw-grid history carry —
    # every stacked frame byte-selects its own grid, frame-major concat
    dict(height=12, width=12, num_snakes=4, snake_length=3,
         frame_stack=3),
    dict(height=14, width=14, num_snakes=2, snake_length=3,
         frame_stack=2, map_layout='cross20'),
])
def test_ray_features_from_grid_equals_obs_form(cfg_kw):
    """ray_features_from_grid == ray_features over the encoded obs,
    exactly, on real rollout states (obs is a pure function of the
    carried grid(s); the grid form byte-selects packed words and must
    reproduce window clipping, zero-padded out-of-grid cells, dead
    snakes, and — for frame_stack > 1 — the stacked history frames)."""
    import numpy as np
    from marlsnake_tpu.core import engine
    from marlsnake_tpu.core.spawn import SpawnData, spawn_data
    from marlsnake_tpu.core.types import EnvConfig
    from marlsnake_tpu.ops.rays import ray_features, ray_features_from_grid

    kw = dict(cfg_kw)
    if kw.pop('map_layout', None):
        from marlsnake_tpu.core.maps import load_layout
        kw['map_layout'] = load_layout('20x20_cross')
        kw.pop('height'), kw.pop('width')
    cfg = EnvConfig(**kw)
    sd = spawn_data(cfg.height, cfg.width, cfg.snake_length,
                    cfg.num_snakes, pool_size=256,
                    map_layout=cfg.map_layout)
    spawn = SpawnData(jnp.asarray(sd.cells),
                      None if sd.blob is None else jnp.asarray(sd.blob))
    rng = np.random.default_rng(1)
    state, obs = engine.reset(cfg, spawn, jax.random.key(3))
    for t in range(40):
        a = ray_features(cfg, obs, state.head, state.direction,
                         state.alive)
        b = ray_features_from_grid(cfg, state.grid, state.head,
                                   state.direction, state.alive,
                                   state.hist_grid)
        assert np.array_equal(np.asarray(a), np.asarray(b)), t
        acts = jnp.asarray(rng.integers(0, 3, size=cfg.num_snakes))
        state, out = engine.step(cfg, state, acts)
        obs = out.obs


# --- packed observation format (EnvConfig.obs_format='packed') -----------

def test_pack_unpack_roundtrip():
    import jax.numpy as jnp
    from marlsnake_tpu.ops.obs_pack import pack_frame, unpack_obs
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 2, size=(3, 5, 7, 8)),
                        dtype=jnp.uint8)
    packed = pack_frame(frame)
    assert packed.shape == (3, 5, 7, 1) and packed.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(unpack_obs(packed)),
                                  np.asarray(frame))


@pytest.mark.parametrize('cfg_kw', [
    dict(height=12, width=12, num_snakes=3, snake_length=3, num_fruits=2),
    # full-obs frame stack: hist-grid re-encode path, packed
    dict(height=12, width=12, num_snakes=4, snake_length=3, num_fruits=2,
         frame_stack=4),
    # vision crop + stored-frame stack, packed
    dict(height=14, width=14, num_snakes=4, snake_length=3, num_fruits=3,
         vision_range=3, frame_stack=2),
    # procedural spawn composes with packed obs
    dict(height=12, width=12, num_snakes=3, snake_length=3, num_fruits=2,
         spawn_mode='procedural'),
    # walls map + packed (the bench fs4 packed rows run on maps)
    dict(num_snakes=8, snake_length=3, num_fruits=3, frame_stack=2,
         map_layout='cross'),
])
def test_packed_obs_bit_identical_to_uint8(cfg_kw):
    """obs_format='packed' trajectories unpack to EXACTLY the uint8-mode
    observations, step for step, through autoreset boundaries."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from marlsnake_tpu.core.types import EnvConfig
    from marlsnake_tpu.envs.vector import build_vector_fns
    from marlsnake_tpu.ops.obs_pack import unpack_obs

    kw = dict(cfg_kw)
    if kw.pop('map_layout', None):
        from marlsnake_tpu.core.maps import load_layout
        kw['map_layout'] = load_layout('20x20_cross')
    cfg_u = EnvConfig(**kw)
    cfg_p = dataclasses.replace(cfg_u, obs_format='packed')
    fs = cfg_u.frame_stack
    ru, su = build_vector_fns(cfg_u, autoreset=True)
    rp, sp = build_vector_fns(cfg_p, autoreset=True)
    e = 8
    keys = jax.random.split(jax.random.key(5), e)
    st_u, ob_u = ru(keys)
    st_p, ob_p = rp(keys)
    assert ob_p.shape == ob_u.shape[:-1] + (fs,)
    np.testing.assert_array_equal(np.asarray(unpack_obs(ob_p)),
                                  np.asarray(ob_u))
    su_j, sp_j = jax.jit(su), jax.jit(sp)
    rng = np.random.default_rng(5)
    boundaries = 0
    for t in range(80):
        acts = jnp.asarray(rng.integers(
            0, 3, size=(e, cfg_u.num_snakes)))
        st_u, out_u = su_j(st_u, acts)
        st_p, out_p = sp_j(st_p, acts)
        np.testing.assert_array_equal(
            np.asarray(unpack_obs(out_p.obs)), np.asarray(out_u.obs),
            err_msg=f'packed obs diverged at t={t}')
        np.testing.assert_array_equal(np.asarray(out_p.reward),
                                      np.asarray(out_u.reward))
        boundaries += int(np.asarray(out_u.done_all).sum())
    assert boundaries > 0  # autoreset actually exercised


def test_encode_frame_packed_equals_packed_encode_frame():
    from marlsnake_tpu.core import engine
    from marlsnake_tpu.core.types import EnvConfig
    from marlsnake_tpu.ops.obs_pack import pack_frame
    cfg = EnvConfig(height=10, width=10, num_snakes=2, snake_length=3)
    # random grids over every cell value the engine can produce
    rng = np.random.default_rng(1)
    import jax.numpy as jnp
    from marlsnake_tpu.core import types as T
    vals = [T.EMPTY, T.WALL, T.FRUIT]
    for i in range(cfg.num_snakes):
        vals += [T.HEAD + (i << T.OWNER_SHIFT),
                 T.BODY + (i << T.OWNER_SHIFT),
                 T.TAIL + (i << T.OWNER_SHIFT)]
    grid = jnp.asarray(rng.choice(vals, size=(10, 10)), dtype=jnp.int32)
    a = engine.encode_frame_packed(cfg, grid)
    b = pack_frame(engine.encode_frame(cfg, grid))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
