"""THE literal seed-0 parity gate: the JITTED TPU engine replays the
ACTUAL reference implementation's ``np.random`` stream and must produce a
bit-exact trajectory — no oracle in between.

How it works: the real reference env (executed via tests/ref_shim.py) is
run under a fixed global seed. Its two points of randomness —

* the spawn permutation + disjointness rejection loop at reset
  (reference snake_env.py:576-589), and
* the fruit ``randint`` draws at reset and on every respawn
  (reference grid_util.py:126-133)

— are captured as concrete cell indices (spawn paths read from the live
``Snake`` objects; fruit cells as the grid's FRUIT-cell diff). The jitted
engine then consumes those captured draws verbatim through the
``spawn_cells``/``fruit_cells`` replay inputs of ``engine.reset``/``step``,
so both implementations are driven by the *same* randomness and every
step's grid, obs, rewards, dones, episodic stats, and ranks must agree
bit-exactly. Episode boundaries are crossed: when all snakes are done the
reference env is reset again (consuming more of the global stream) and the
engine replays that reset too.
"""

import functools
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from marlsnake_tpu.core import engine
from marlsnake_tpu.core import types as T
from marlsnake_tpu.core.types import EnvConfig

try:
    from ref_shim import load_reference_snake_env, REF_PATH
    RefSnakeEnv = load_reference_snake_env()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    from marlenv.envs.coop_snake_env import CoopSnakeEnv
    from marlenv.envs.graph_snake_env import GraphSnakeEnv
    HAVE_REF = True
except Exception:  # reference tree not mounted
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason='reference repo not available')


# 'variant' routes the case through the matching reference class
# (Snake-v1 / SnakeCoop-v1 / SnakeGraph-v1) so all three env ids cross
# the DIRECT jitted-engine replay path.
CASES = [
    # the BASELINE.json north-star config: 20x20, 4 snakes
    dict(height=20, width=20, num_snakes=4, snake_length=3, num_fruits=3),
    dict(height=10, width=10, num_snakes=2, snake_length=3, num_fruits=2),
    dict(height=20, width=20, num_snakes=4, snake_length=5, num_fruits=3,
         vision_range=5, frame_stack=2),
    dict(height=12, width=12, num_snakes=4, snake_length=3, num_fruits=2,
         observer='human'),
    # coop: episode ends when ANY snake dies, done broadcast to all
    dict(height=12, width=12, num_snakes=3, snake_length=3, num_fruits=2,
         variant='coop'),
    # n=5: the double-decrement quirk region (first-alive-only win mask)
    dict(height=14, width=14, num_snakes=5, snake_length=3, num_fruits=4),
    # graph: ray-feature obs; core trajectory replayed directly, obs
    # compared through the jitted ray transform while all snakes are
    # alive (the reference compacts dead snakes' rows away — documented
    # divergence, tests/test_variants_vs_reference.py)
    dict(height=14, width=14, num_snakes=4, snake_length=3, num_fruits=3,
         variant='graph'),
]


def canon_engine_grid(grid):
    """Engine bit-packed cells (type | owner<<4) -> reference decimal
    packing (type + 10*owner) for bit-exact grid comparison."""
    g = np.asarray(grid)
    return T.cell_type(g) + 10 * T.cell_owner(g)


def ref_spawn_cells(env, width):
    """(N, k) head-first flat cells read from the live reference snakes."""
    rows = []
    for s in env.snakes:
        coords = [(int(c[0]), int(c[1])) for c in s.coords]
        rows.append([r * width + c for (r, c) in coords])
    return np.asarray(rows, dtype=np.int32)


def fruit_cells_of(grid):
    """Flat indices of FRUIT cells in a reference grid (value == 2)."""
    return set(np.flatnonzero(np.asarray(grid).reshape(-1) == 2).tolist())


def pad_cells(cells, size):
    out = np.full((size,), -1, dtype=np.int32)
    cells = sorted(cells)[:size]
    out[:len(cells)] = cells
    return out


def _ref_raw_rows(ref):
    """Per-snake stacked raw obs from the reference frame deque (does not
    mutate it — ref._get_obs() would append a frame)."""
    raw = [np.concatenate(o, axis=-1) for o in zip(*list(ref.obs))]
    return np.stack(raw).astype(np.uint8)


@pytest.mark.parametrize('case', range(len(CASES)))
@pytest.mark.parametrize('seed', [0, 1, 7, 42])
def test_engine_replays_reference_stream(case, seed, steps=150):
    params = dict(CASES[case])
    variant = params.pop('variant', None)
    cfg_kwargs = dict(params)
    if variant == 'coop':
        cfg_kwargs['done_mode'] = 'any'
    cfg = EnvConfig(**cfg_kwargs)
    n, w = cfg.num_snakes, cfg.width
    nf = cfg.resolved_num_fruits

    np.random.seed(seed)
    kwargs = dict(params)
    ref_nf = kwargs.pop('num_fruits')
    ref_cls = {'coop': CoopSnakeEnv, 'graph': GraphSnakeEnv}.get(
        variant, RefSnakeEnv)
    ref = ref_cls(num_fruits=ref_nf, **kwargs)

    # jitted replay entry points: randomness comes ONLY from the traced
    # spawn_cells / fruit_cells arguments (the key is a dead input).
    dead_key = jax.random.key(0)
    reset_fn = jax.jit(lambda sc, fc: engine.reset(
        cfg, None, dead_key, spawn_cells=sc, fruit_cells=fc))
    step_fn = jax.jit(functools.partial(engine.step, cfg))
    if variant == 'graph':
        from marlsnake_tpu.ops.rays import ray_features
        rays_fn = jax.jit(functools.partial(ray_features, cfg))

        def check_graph_obs(state, raw_obs, t):
            """Our jitted ray transform on the engine's raw obs must match
            the reference's float rays while every snake is alive (the
            reference compacts dead rows — a documented divergence)."""
            alive = np.asarray(state.alive)
            if not alive.all():
                return
            ours = np.asarray(rays_fn(raw_obs, state.head,
                                      state.direction, state.alive))
            ref_proc = np.asarray(
                ref._process_obs(list(_ref_raw_rows(ref))), np.float64)
            np.testing.assert_allclose(ours, ref_proc, atol=1e-5,
                                       err_msg=f'graph rays t={t}')

    def ref_reset_and_replay():
        obs_r = ref.reset()
        sc = ref_spawn_cells(ref, w)
        fc = pad_cells(fruit_cells_of(ref.grid), max(nf, 1))
        state, obs_e = reset_fn(jnp.asarray(sc), jnp.asarray(fc))
        np.testing.assert_array_equal(canon_engine_grid(state.grid),
                                      ref.grid, err_msg='reset grid')
        if variant == 'graph':
            check_graph_obs(state, obs_e, 'reset')
        else:
            np.testing.assert_array_equal(np.asarray(obs_e),
                                          np.asarray(obs_r),
                                          err_msg='reset obs')
        return state

    state = ref_reset_and_replay()
    rng = np.random.default_rng(1000 + seed)

    for t in range(steps):
        actions = rng.integers(0, cfg.num_actions, size=n)
        fruits_before = fruit_cells_of(ref.grid)
        obs_r, rews_r, dones_r, info_r = ref.step(list(actions))
        new_fruits = fruit_cells_of(ref.grid) - fruits_before
        fc = pad_cells(new_fruits, n)

        state, out = step_fn(state, jnp.asarray(actions), jnp.asarray(fc))

        np.testing.assert_array_equal(
            canon_engine_grid(state.grid), ref.grid,
            err_msg=f'grid mismatch t={t}')
        if variant == 'graph':
            check_graph_obs(state, out.obs, t)
        else:
            np.testing.assert_array_equal(
                np.asarray(out.obs), np.asarray(obs_r),
                err_msg=f'obs mismatch t={t}')
        np.testing.assert_allclose(
            np.asarray(out.reward), np.asarray(rews_r, dtype=np.float32),
            rtol=0, atol=1e-6, err_msg=f'reward mismatch t={t}')
        np.testing.assert_array_equal(
            np.asarray(out.done), np.asarray(dones_r),
            err_msg=f'done mismatch t={t}')

        if info_r:
            assert bool(out.done_all), f'done_all mismatch t={t}'
            np.testing.assert_array_equal(np.asarray(out.rank),
                                          np.asarray(info_r['rank']),
                                          err_msg=f'rank t={t}')
            np.testing.assert_allclose(
                np.asarray(out.episode_scores),
                info_r['episode_scores'].astype(np.float32),
                atol=1e-4, rtol=1e-5, err_msg=f'episode_scores t={t}')
            for key in ('episode_steps', 'episode_fruits', 'episode_kills'):
                np.testing.assert_allclose(
                    np.asarray(getattr(out, key)),
                    info_r[key].astype(np.float32), atol=0,
                    err_msg=f'{key} t={t}')
        else:
            assert not bool(out.done_all), f'done_all mismatch t={t}'

        if all(dones_r):
            # cross the episode boundary: the reference consumes more of
            # the global stream on its next reset; replay that too.
            state = ref_reset_and_replay()
