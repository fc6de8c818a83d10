"""Spawn-candidate enumeration.

The reference enumerates *every* k-cell self-avoiding path from every empty
cell on every ``reset()`` (``core/grid_util.py:73-99`` via
``envs/snake_env.py:576-589``) — measured at ~82 ms for a 20x20 grid. For the
TPU engine the candidate set depends only on (height, width, snake_length)
because the freshly-built grid is always an empty field with a 1-cell border
wall (``core/grid_util.py:14-20``). We therefore enumerate ONCE on the host,
cache the result, and let ``reset`` sample disjoint candidates on-device.

Enumeration order and pruning replicate the reference exactly (same
row-major outer sweep, same SHIFTS order [(0,1),(1,0),(0,-1),(-1,0)], same
``_head_blocked`` prune at ``core/grid_util.py:102-110``) so that a
reference-RNG parity harness can index the same candidate list.

A C++ fast path (``native/spawn_enum.cpp``) is used when the shared library
has been built; the pure-Python fallback is always available.
"""

from __future__ import annotations

import ctypes
import functools
import os
from typing import NamedTuple

import numpy as np

# Same neighbor order as reference core/grid_util.py:7-11
# (names there are misleading; only the order matters).
SHIFTS = ((0, 1), (1, 0), (0, -1), (-1, 0))

_NATIVE_LIB = None
_NATIVE_TRIED = False


def _load_native():
    global _NATIVE_LIB, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE_LIB
    _NATIVE_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(here, 'native', 'libspawn_enum.so')
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.enumerate_paths.restype = ctypes.c_longlong
            lib.enumerate_paths.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.c_longlong,
            ]
            # masked variant (custom interior walls); absent in .so
            # builds predating it -> fall back to the Python DFS there
            if hasattr(lib, 'enumerate_paths_masked'):
                lib.enumerate_paths_masked.restype = ctypes.c_longlong
                lib.enumerate_paths_masked.argtypes = [
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_int), ctypes.c_longlong,
                ]
            _NATIVE_LIB = lib
        except OSError:
            _NATIVE_LIB = None
    return _NATIVE_LIB


def _head_blocked(mask: np.ndarray, history, extra_node) -> bool:
    """Replicates reference core/grid_util.py:102-110."""
    check = 0
    first = history[0]
    for sr, sc in SHIFTS:
        node = (first[0] + sr, first[1] + sc)
        if (mask[node] == 0 or node in history or node == extra_node):
            check += 1
    return check == len(SHIFTS)


def _dfs(mask: np.ndarray, node, history, k, out):
    history = history + [node]
    if len(history) == k:
        out.append(history)
        return
    for sr, sc in SHIFTS:
        cand = (node[0] + sr, node[1] + sc)
        if (0 <= cand[0] < mask.shape[0] and 0 <= cand[1] < mask.shape[1]
                and cand not in history and mask[cand]):
            if not _head_blocked(mask, history, cand):
                _dfs(mask, cand, history, k, out)


def enumerate_spawn_paths_py(height: int, width: int, k: int,
                             wall_mask=None) -> np.ndarray:
    """All k-cell self-avoiding spawn paths on a bordered grid.

    Returns (C, k, 2) int32, head first — same path order as the reference's
    ``dfs_sweep_empty`` on a fresh grid. ``wall_mask`` (H, W) bool adds
    custom interior walls.
    """
    mask = np.ones((height, width), dtype=np.uint8)
    mask[[0, -1]] = 0
    mask[:, [0, -1]] = 0
    if wall_mask is not None:
        mask[np.asarray(wall_mask)] = 0
    out = []
    for r in range(height):
        for c in range(width):
            if mask[r, c]:
                _dfs(mask, (r, c), [], k, out)
    if not out:
        return np.zeros((0, k, 2), dtype=np.int32)
    return np.asarray(out, dtype=np.int32)


def enumerate_spawn_paths_native(height: int, width: int, k: int,
                                 wall_mask=None) -> np.ndarray:
    lib = _load_native()
    if lib is None:
        raise RuntimeError('native spawn enumerator not built')
    if wall_mask is not None and not hasattr(lib, 'enumerate_paths_masked'):
        raise RuntimeError('native library predates the masked variant')

    if wall_mask is not None:
        walls = np.ascontiguousarray(
            np.asarray(wall_mask, dtype=np.uint8).reshape(-1))
        assert walls.size == height * width

        def call(buf, cap):
            return lib.enumerate_paths_masked(
                height, width, k,
                walls.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                buf, cap)
    else:
        def call(buf, cap):
            return lib.enumerate_paths(height, width, k, buf, cap)

    # First call with null buffer to count, then fill.
    n = call(ctypes.cast(None, ctypes.POINTER(ctypes.c_int)), 0)
    if n < 0:
        raise RuntimeError('native spawn enumeration failed')
    buf = np.zeros((int(n), k, 2), dtype=np.int32)
    n2 = call(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), int(n))
    assert n2 == n, (n2, n)
    return buf


@functools.lru_cache(maxsize=32)
def spawn_pool(height: int, width: int, k: int, num_snakes: int,
               pool_size: int = 1 << 16, seed: int = 0,
               map_layout=None) -> np.ndarray:
    """(M, num_snakes) int32 pool of DISJOINT spawn combinations.

    Device-side rejection sampling of disjoint snake placements costs a
    vmapped while_loop whose iteration count is the max over the whole env
    batch (~12+ rounds at 4096 envs on 20x20); instead we reject on the
    host ONCE per config with vectorized numpy and let ``reset`` draw a
    single pool row. The pool is seeded deterministically so builds are
    reproducible.
    """
    cand = spawn_candidates(height, width, k, map_layout)
    c = len(cand)
    if c == 0:
        return np.zeros((0, num_snakes), np.int32)
    rng = np.random.default_rng(seed)
    # int32 flat cells: halves the bytes through the disjointness sort,
    # which dominates pool construction on big boards (40x40/8-snake)
    cells = cand[:, :, 0].astype(np.int32) * width + cand[:, :, 1]
    rows = []
    need = pool_size
    for _ in range(64):
        if need <= 0:
            break
        draw = rng.integers(0, c, size=(max(need * 2, 1024), num_snakes))
        cc = cells[draw]  # (B, N, k)
        flat = cc.reshape(cc.shape[0], -1)
        flat_sorted = np.sort(flat, axis=1)
        ok = (np.diff(flat_sorted, axis=1) != 0).all(axis=1)
        good = draw[ok]
        rows.append(good[:need])
        need -= len(good[:need])
    if not rows or sum(len(r) for r in rows) == 0:
        raise ValueError('no disjoint spawn combination found')
    pool = np.concatenate(rows, axis=0)
    if len(pool) < pool_size:
        # tight boards: tile what we found
        reps = -(-pool_size // len(pool))
        pool = np.tile(pool, (reps, 1))[:pool_size]
    return np.ascontiguousarray(pool.astype(np.int32))


class SpawnData(NamedTuple):
    """Per-pool-row reset data, fully precomputed on the host.

    ``reset`` draws one row and gathers it — a single small gather
    instead of the chained pool-row -> candidate-path computation (which
    cost ~7ms/step of device time at 4096 autoreset envs in traces).
    Rows are stored flat so the per-env gather is one contiguous row
    fetch; ring-dirs are derived on device from flat-cell deltas
    (feeding the ring from a precomputed gather flips XLA's ring layout
    and makes the ring ops ~8x slower — see engine._reset_core).

    ``blob`` additionally carries the fully PAINTED reset grid per row
    (body/head/tail codes on the walled base grid, pre-fruit) so reset
    needs zero on-device paint passes: TPU row gathers are latency-bound,
    not byte-bound (a 24-byte row and a 424-byte row gather cost the
    same ~50us/step at 4096 envs), while the three dense one-hot paint
    reductions they replace cost ~2.5ms/64 steps. Layout:
    Byte layout per row (viewed as little-endian u32 words — the row
    gather's kCustom lowering scales with element count, so 4 bytes per
    element is ~25% cheaper than u8): painted grid cells (uint8 packed
    codes, zero-padded to a word boundary), then the (N*k,) flat cells
    as uint16 pairs (padded likewise). One gather serves both; cells
    and grid bytes are unpacked arithmetically on device
    (engine._reset_core). None when H*W doesn't fit uint16.
    """
    cells: np.ndarray  # (P, N*k) int32 — head-first flat r*W+c indices
    blob: np.ndarray = None  # (P, ceil(H*W/4) + ceil(N*k/2)) <u4, or None


def base_grid_host(height: int, width: int, map_layout=None) -> np.ndarray:
    """Host mirror of engine.make_empty_grid (same codes, numpy)."""
    from marlsnake_tpu.core import types as T
    if map_layout is not None:
        from marlsnake_tpu.core.maps import parse_layout
        mask = parse_layout(map_layout)
        return np.where(mask, T.WALL, T.EMPTY).astype(np.int32)
    grid = np.full((height, width), T.EMPTY, dtype=np.int32)
    grid[[0, -1], :] = T.WALL
    grid[:, [0, -1]] = T.WALL
    return grid


@functools.lru_cache(maxsize=32)
def spawn_data(height: int, width: int, k: int, num_snakes: int,
               pool_size: int = 1 << 16, seed: int = 0,
               map_layout=None, min_blob_cells: int = 256) -> SpawnData:
    """Precompute the flat spawn cells + painted grid of every pool row.

    ``min_blob_cells`` gates the painted-grid blob by board size: the
    per-reset row gather is LATENCY-bound per row (nearly independent
    of row length — a 2-word cells row costs almost what the 27-word
    10x10 blob row does), so on small boards the on-device dense paint
    (a few hundred one-hot ops) beats carrying the paint in the gather:
    10x10x1 measured 33.2M -> 34.5M env-steps/s without the blob, while
    the 400-cell boards keep their ~2.5ms/64-steps blob win.
    """
    from marlsnake_tpu.core import types as T
    cand = spawn_candidates(height, width, k, map_layout)
    pool = spawn_pool(height, width, k, num_snakes, pool_size, seed,
                      map_layout)
    coords = cand[pool]  # (P, N, k, 2)
    cells = coords[..., 0].astype(np.int64) * width + coords[..., 1]
    cells = cells.reshape(cells.shape[0], -1)  # (P, N*k) contiguous rows
    cells = np.ascontiguousarray(cells.astype(np.int32))

    blob = None
    # num_snakes gate: painted cells are uint8 (type | owner<<4), which
    # holds owners 0..15 (max code TAIL | 15<<4 = 245) — beyond 16
    # snakes the paint would silently wrap, so those configs take the
    # on-device paint fallback in engine._reset_core instead
    if (height * width <= 0xFFFF and num_snakes <= 16
            and height * width >= min_blob_cells and len(cells)):
        p = len(cells)
        base = base_grid_host(height, width, map_layout)
        painted = np.broadcast_to(
            base.reshape(-1).astype(np.uint8), (p, height * width)).copy()
        rows = np.arange(p)[:, None]
        ids = (np.arange(num_snakes, dtype=np.uint8)
               << T.OWNER_SHIFT)  # owner bits
        c3 = cells.reshape(p, num_snakes, k)
        # body, then head, then tail — same order as the device paint
        # (engine._reset_core / reference snake_env.py:138-144)
        painted[rows, c3.reshape(p, -1)] = np.repeat(T.BODY + ids, k)[None]
        painted[rows, c3[:, :, 0]] = (T.HEAD + ids)[None]
        painted[rows, c3[:, :, -1]] = (T.TAIL + ids)[None]
        cell_bytes = cells.astype('<u2').view(np.uint8).reshape(p, -1)
        # pack the byte row into little-endian u32 words (each section
        # zero-padded to a word boundary): the per-env reset row gather
        # lowers to a kCustom dynamic-gather whose cost scales with the
        # ELEMENT count, not bytes — 4x fewer elements measured
        # 4.2 -> ~3.3ms/64 steps at 4096 envs (see engine._reset_core)
        pad_g = -painted.shape[1] % 4
        pad_c = -cell_bytes.shape[1] % 4
        raw = np.concatenate(
            [painted, np.zeros((p, pad_g), np.uint8),
             cell_bytes, np.zeros((p, pad_c), np.uint8)], axis=1)
        blob = np.ascontiguousarray(raw).view('<u4')
    return SpawnData(cells=cells, blob=blob)


@functools.lru_cache(maxsize=32)
def spawn_candidates(height: int, width: int, k: int,
                     map_layout=None) -> np.ndarray:
    """Cached (C, k, 2) int32 candidate paths for a bordered grid,
    optionally with the custom walls of ``map_layout``."""
    wall_mask = None
    if map_layout is not None:
        from marlsnake_tpu.core.maps import parse_layout
        wall_mask = parse_layout(map_layout)
    if _load_native() is not None:
        try:
            return enumerate_spawn_paths_native(height, width, k,
                                                wall_mask)
        except RuntimeError:
            pass
    return enumerate_spawn_paths_py(height, width, k, wall_mask)
