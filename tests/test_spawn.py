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
