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
