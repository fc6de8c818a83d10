"""Custom wall-map tests: loader, spawn masking, engine/oracle parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlsnake_tpu.core import types as T
from marlsnake_tpu.core.maps import bundled_maps, load_layout, parse_layout
from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.env import make_env
from marlsnake_tpu.oracle import OracleEnv

CROSS = (
    '##########',
    '#........#',
    '#........#',
    '#...##...#',
    '#...##...#',
    '#........#',
    '#........#',
    '#........#',
    '#........#',
    '##########',
)


def test_parse_layout_and_bundled():
    mask = parse_layout(CROSS)
    assert mask.shape == (10, 10)
    assert mask[3, 4] and not mask[1, 1]
    assert 'Snake' not in bundled_maps()
    assert '20x20_cross' in bundled_maps()
    layout = load_layout('20x20_cross')
    assert parse_layout(layout).shape == (20, 20)


def test_parse_layout_rejects_open_border():
    with pytest.raises(ValueError):
        parse_layout(('###', '#..', '###'))


def test_spawns_avoid_walls():
    cfg = EnvConfig(num_snakes=2, snake_length=3, num_fruits=2,
                    map_layout=CROSS)
    env = make_env(cfg)
    cand = np.asarray(env.candidates)
    mask = parse_layout(CROSS)
    for p in cand.reshape(-1, 2):
        assert not mask[p[0], p[1]]


def test_engine_oracle_parity_on_map():
    cfg = EnvConfig(num_snakes=2, snake_length=3, num_fruits=2,
                    map_layout=CROSS)
    env = make_env(cfg)
    oracle = OracleEnv(cfg, rng_mode='jax')
    key = jax.random.key(11)
    state, obs_e = env.reset(key)
    obs_o = oracle.reset(key=key)
    np.testing.assert_array_equal(np.asarray(obs_e), obs_o)
    rng = np.random.default_rng(2)
    for t in range(60):
        actions = rng.integers(0, 3, size=2)
        state, out = env.step(state, jnp.asarray(actions))
        obs_o, rews_o, dones_o, _ = oracle.step(actions)
        np.testing.assert_array_equal(np.asarray(state.grid), oracle.grid,
                                      err_msg=f'grid t={t}')
        np.testing.assert_array_equal(np.asarray(out.obs), obs_o,
                                      err_msg=f'obs t={t}')


def test_interior_walls_in_obs_and_grid():
    cfg = EnvConfig(num_snakes=1, snake_length=2, num_fruits=1,
                    map_layout=CROSS)
    env = make_env(cfg)
    state, obs = env.reset(jax.random.key(0))
    grid = np.asarray(state.grid)
    assert grid[3, 4] == T.WALL
    assert np.asarray(obs)[0, 3, 4, T.CH_WALL] == 1


def test_40x40_ml2_bundled_and_playable():
    """The reference's largest shipped asset (assets/40x40_ml2.txt) is
    bundled and the engine plays on it."""
    layout = load_layout('40x40_ml2')
    mask = parse_layout(layout)
    assert mask.shape == (40, 40)
    assert mask.sum() > 100  # the ml2 maze has many interior walls
    cfg = EnvConfig(height=40, width=40, num_snakes=8, snake_length=5,
                    num_fruits=6, map_layout=layout)
    env = make_env(cfg)
    key = jax.random.key(3)
    state, obs = env.reset(key)
    grid = np.asarray(state.grid)
    walls = T.cell_type(grid) == T.WALL
    assert walls[mask].all()  # interior walls painted
    rng = np.random.default_rng(0)
    for _ in range(20):
        state, out = env.step(state, jnp.asarray(
            rng.integers(0, 3, 8), jnp.int32))
    assert np.asarray(out.obs).shape == cfg.obs_shape
