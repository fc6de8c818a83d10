"""Spawn enumeration tests: Python vs native, and reference-order
properties."""

import numpy as np
import pytest

from marlsnake_tpu.core.spawn import (_load_native,
                                      enumerate_spawn_paths_native,
                                      enumerate_spawn_paths_py,
                                      spawn_candidates)


def test_paths_are_valid_self_avoiding():
    paths = enumerate_spawn_paths_py(8, 8, 4)
    assert len(paths) > 0
    for p in paths[:200]:
        # unit steps
        d = np.abs(np.diff(p, axis=0)).sum(axis=1)
        assert (d == 1).all()
        # self-avoiding
        assert len({tuple(c) for c in p}) == len(p)
        # interior only (border is wall)
        assert (p >= 1).all() and (p <= 6).all()


@pytest.mark.skipif(_load_native() is None,
                    reason='native library not built')
@pytest.mark.parametrize('hwk', [(8, 8, 3), (10, 10, 4), (7, 9, 5)])
def test_native_matches_python(hwk):
    h, w, k = hwk
    a = enumerate_spawn_paths_py(h, w, k)
    b = enumerate_spawn_paths_native(h, w, k)
    np.testing.assert_array_equal(a, b)


def test_cache_returns_same_object():
    a = spawn_candidates(8, 8, 3)
    b = spawn_candidates(8, 8, 3)
    assert a is b


@pytest.mark.skipif(_load_native() is None,
                    reason='native library not built')
def test_native_masked_matches_python():
    from marlsnake_tpu.core.maps import load_layout, parse_layout
    mask = parse_layout(load_layout('20x20_cross'))
    a = enumerate_spawn_paths_py(20, 20, 4, mask)
    b = enumerate_spawn_paths_native(20, 20, 4, mask)
    assert len(a) > 0
    np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(_load_native() is None,
                    reason='native library not built')
def test_40x40_scale_enumeration_is_fast():
    """DFS candidate count grows fast with board size; the native path
    must keep 40x40 enumeration well under a second (measured ~8ms for
    ~88k candidates on the ml2 map). Pool construction is lru-cached per
    config, so its ~1s one-time cost never recurs."""
    import time
    from marlsnake_tpu.core.maps import load_layout, parse_layout
    from marlsnake_tpu.core.spawn import spawn_data
    layout = load_layout('40x40_ml2')
    t0 = time.perf_counter()
    paths = enumerate_spawn_paths_native(40, 40, 5,
                                         parse_layout(layout))
    dt = time.perf_counter() - t0
    assert len(paths) > 50_000
    assert dt < 1.0, f'native 40x40 enumeration took {dt:.2f}s'
    sd = spawn_data(40, 40, 5, 8, map_layout=layout)
    assert sd.cells.shape == (1 << 16, 40)
    # disjointness: every pool row places 8 snakes on 40 distinct cells
    rows = sd.cells[:128].astype(np.int64)
    assert all(len(np.unique(r)) == 40 for r in rows)


@pytest.mark.parametrize('cfg_kw', [
    dict(height=10, width=10, num_snakes=2, snake_length=3),
    dict(height=20, width=20, num_snakes=4, snake_length=3),
    dict(height=20, width=20, num_snakes=8, snake_length=3,
         map_layout='cross'),
    # H*W % 4 != 0 and odd cell count: exercises the blob's u32-word
    # zero-padding of both the grid and cell sections
    dict(height=11, width=13, num_snakes=3, snake_length=3),
    # 32768 < H*W <= 65535 (inside the blob gate): cell indices >= 32768
    # land in the HIGH u16 of a packed word — regression for the decode
    # sign-extension bug (a bare int32 >>16 turned them negative)
    dict(height=190, width=190, num_snakes=2, snake_length=2),
])
def test_blob_reset_equals_dense_paint(cfg_kw):
    """SpawnData.blob (host-painted reset grid + cells as LE u16 pairs,
    packed into LE u32 words and fetched by one row gather) must be
    bit-identical to the on-device dense-paint fallback for EVERY pool
    row, and engine.reset must produce identical states through either
    path."""
    import jax
    import jax.numpy as jnp
    from marlsnake_tpu.core import engine
    from marlsnake_tpu.core.spawn import SpawnData, spawn_data, base_grid_host
    from marlsnake_tpu.core.types import EnvConfig
    from marlsnake_tpu.core.maps import load_layout

    kw = dict(cfg_kw)
    layout = load_layout('20x20_cross') if kw.pop('map_layout', None) else None
    cfg = EnvConfig(snake_length=kw.pop('snake_length'),
                    map_layout=layout, spawn_pool_size=256, **kw)
    sd = spawn_data(cfg.height, cfg.width, cfg.snake_length,
                    cfg.num_snakes, pool_size=cfg.spawn_pool_size,
                    map_layout=cfg.map_layout,
                    min_blob_cells=0)  # force the blob on small boards
    assert sd.blob is not None
    p, hw = len(sd.cells), cfg.height * cfg.width

    # (a) every row: painted section == numpy repaint; byte section == cells
    base = base_grid_host(cfg.height, cfg.width, cfg.map_layout).reshape(-1)
    import marlsnake_tpu.core.types as T
    n, k = cfg.num_snakes, cfg.snake_length
    c3 = sd.cells.reshape(p, n, k)
    expect = np.broadcast_to(base.astype(np.uint8), (p, hw)).copy()
    rows = np.arange(p)[:, None]
    ids = (np.arange(n, dtype=np.uint8) << T.OWNER_SHIFT)
    expect[rows, c3.reshape(p, -1)] = np.repeat(T.BODY + ids, k)[None]
    expect[rows, c3[:, :, 0]] = (T.HEAD + ids)[None]
    expect[rows, c3[:, :, -1]] = (T.TAIL + ids)[None]
    assert sd.blob.dtype == np.dtype('<u4')
    blob_bytes = sd.blob.view(np.uint8)
    np.testing.assert_array_equal(blob_bytes[:, :hw], expect)
    coff = 4 * (-(-hw // 4))  # grid section padded to a word boundary
    cell_b = blob_bytes[:, coff:coff + 2 * n * k]
    back = (cell_b[:, ::2].astype(np.int32)
            | (cell_b[:, 1::2].astype(np.int32) << 8))
    np.testing.assert_array_equal(back, sd.cells)

    # (b) engine.reset: blob path == dense-paint path, whole state + obs
    import jax.numpy as jnp
    spawn_blob = SpawnData(jnp.asarray(sd.cells), jnp.asarray(sd.blob))
    spawn_paint = SpawnData(jnp.asarray(sd.cells), None)
    for seed in range(4):
        key = jax.random.key(seed)
        s1, o1 = jax.jit(lambda k: engine.reset(cfg, spawn_blob, k))(key)
        s2, o2 = jax.jit(lambda k: engine.reset(cfg, spawn_paint, k))(key)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                *((jax.random.key_data(a), jax.random.key_data(b))
                  if jnp.issubdtype(a.dtype, jax.dtypes.prng_key)
                  else (a, b))),
            s1, s2)
        np.testing.assert_array_equal(o1, o2)


def test_many_snakes_skips_blob_and_resets_correctly():
    """num_snakes > 16 cannot use the uint8-painted blob (owner bits
    would wrap silently) — spawn_data must omit it and the on-device
    paint fallback must produce a consistent reset."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from marlsnake_tpu.core import engine
    from marlsnake_tpu.core import types as T
    from marlsnake_tpu.core.spawn import SpawnData, spawn_data
    from marlsnake_tpu.core.types import EnvConfig

    n = 17
    sd = spawn_data(20, 20, 2, n, pool_size=64)
    assert sd.blob is None  # gate: fallback path
    cfg = EnvConfig(height=20, width=20, num_snakes=n, snake_length=2)
    spawn = SpawnData(jnp.asarray(sd.cells), None)
    state, obs = engine.reset(cfg, spawn, jax.random.key(0))
    grid = np.asarray(state.grid)
    t = T.cell_type(grid)
    owner = T.cell_owner(grid)
    for i in range(n):
        assert ((t == T.HEAD) & (owner == i)).sum() == 1, i
        assert ((t == T.TAIL) & (owner == i)).sum() == 1, i
    assert np.asarray(state.alive).all()
    assert obs.shape == (n, 20, 20, 8)


def test_procedural_spawn_validity_and_autoreset():
    """spawn_mode='procedural': every reset yields in-bounds, disjoint,
    wall-free straight segments (horizontal, or vertical when the band
    is tall enough) with coherent head/tail/ring state; the vectorized
    autoreset path re-spawns through the same arithmetic."""
    import jax
    import jax.numpy as jnp
    from marlsnake_tpu.core import engine
    from marlsnake_tpu.core import types as T
    from marlsnake_tpu.core.types import EnvConfig
    from marlsnake_tpu.envs.vector import build_vector_fns

    cfg = EnvConfig(height=11, width=12, num_snakes=3, snake_length=4,
                    num_fruits=2, spawn_mode='procedural')
    n, k = cfg.num_snakes, cfg.snake_length
    b = (cfg.height - 2) // n
    assert b < k  # this config's bands are too short for vertical

    reset = jax.jit(lambda key: engine.reset(cfg, None, key))
    for seed in range(32):
        state, obs = reset(jax.random.key(seed))
        grid = np.asarray(state.grid)
        head = np.asarray(state.head)
        tail = np.asarray(state.tail)
        for i in range(n):
            cells = np.argwhere((T.cell_owner(grid) == i)
                                & (T.cell_type(grid) >= T.HEAD))
            assert len(cells) == k, (seed, i)
            # one horizontal run inside snake i's private band
            assert (cells[:, 0] == cells[0, 0]).all()
            assert 1 + i * b <= cells[0, 0] < 1 + (i + 1) * b
            cs = np.sort(cells[:, 1])
            assert cs[0] >= 1 and cs[-1] <= cfg.width - 2
            assert (np.diff(cs) == 1).all()
            # head/tail at the segment ends
            assert head[i, 1] in (cs[0], cs[-1])
            assert tail[i, 1] == (cs[-1] if head[i, 1] == cs[0]
                                  else cs[0])
        # fruits placed (with-replacement semantics: duplicates collapse,
        # reference grid_util.py:126-133)
        assert 1 <= (T.cell_type(grid) == T.FRUIT).sum() <= 2

    # vectorized autoreset drives many procedural re-spawns
    reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)
    e = 16
    states, _ = reset_fn(jax.random.split(jax.random.key(9), e))
    rng = np.random.default_rng(9)
    resets_seen = 0
    step_j = jax.jit(step_fn)
    for t in range(120):
        acts = jnp.asarray(rng.integers(0, 3, size=(e, n)))
        states, out = step_j(states, acts)
        resets_seen += int(np.asarray(out.done_all).sum())
    assert resets_seen > 0
    # every env's grid must again hold n full snakes (autoreset worked)
    grids = np.asarray(states.grid)
    alive = np.asarray(states.alive)
    for env_i in range(e):
        for i in range(n):
            cells = ((T.cell_owner(grids[env_i]) == i)
                     & (T.cell_type(grids[env_i]) >= T.HEAD)).sum()
            if alive[env_i, i]:
                assert cells >= 2


def test_procedural_spawn_vertical_family():
    """With bands >= snake_length rows tall the procedural family also
    emits VERTICAL segments: over many resets both orientations appear,
    every segment is straight, in-band, wall-free and disjoint, and
    head/tail sit at the segment ends."""
    import jax
    from marlsnake_tpu.core import engine
    from marlsnake_tpu.core import types as T
    from marlsnake_tpu.core.types import EnvConfig

    cfg = EnvConfig(height=20, width=20, num_snakes=4, snake_length=3,
                    num_fruits=3, spawn_mode='procedural',
                    spawn_orientations='both')
    n, k = cfg.num_snakes, cfg.snake_length
    b = (cfg.height - 2) // n
    assert b >= k

    reset = jax.jit(lambda key: engine.reset(cfg, None, key))
    orientations = set()
    for seed in range(24):
        state, _ = reset(jax.random.key(seed))
        grid = np.asarray(state.grid)
        head = np.asarray(state.head)
        tail = np.asarray(state.tail)
        for i in range(n):
            cells = np.argwhere((T.cell_owner(grid) == i)
                                & (T.cell_type(grid) >= T.HEAD))
            assert len(cells) == k, (seed, i)
            rows, cols = cells[:, 0], cells[:, 1]
            # whole segment inside snake i's private band, off the walls
            assert (1 + i * b <= rows).all()
            assert (rows < 1 + (i + 1) * b).all()
            assert (1 <= cols).all() and (cols <= cfg.width - 2).all()
            if (rows == rows[0]).all():      # horizontal
                orientations.add('h')
                cs = np.sort(cols)
                assert (np.diff(cs) == 1).all()
                ends = {(rows[0], cs[0]), (rows[0], cs[-1])}
            else:                            # vertical
                orientations.add('v')
                assert (cols == cols[0]).all()
                rs = np.sort(rows)
                assert (np.diff(rs) == 1).all()
                ends = {(rs[0], cols[0]), (rs[-1], cols[0])}
            assert tuple(head[i]) in ends
            assert tuple(tail[i]) in ends and tuple(tail[i]) != tuple(
                head[i])
    # both orientations must show up across 24 resets x 4 snakes
    # (P[miss one] ~ 2 * 0.5^96)
    assert orientations == {'h', 'v'}


def test_procedural_spawn_config_validation():
    import pytest as _pytest
    from marlsnake_tpu.core.types import EnvConfig
    with _pytest.raises(ValueError):
        EnvConfig(height=5, width=20, num_snakes=4, snake_length=3,
                  spawn_mode='procedural')  # 3 interior rows < 4 snakes
    with _pytest.raises(ValueError):
        EnvConfig(height=20, width=6, num_snakes=2, snake_length=5,
                  spawn_mode='procedural')  # segment wider than interior
    with _pytest.raises(ValueError):
        EnvConfig(spawn_mode='nonsense')
