"""Property tests: conservation invariants over random rollouts
(SURVEY.md §4: alive count, body lengths, grid <-> ring consistency,
wall integrity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlsnake_tpu.core import types as T
from marlsnake_tpu.core.state import ring_slots
from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.env import make_env


def check_invariants(cfg, state, t):
    grid = np.asarray(state.grid)
    tcell = T.cell_type(grid)
    owner = T.cell_owner(grid)
    alive = np.asarray(state.alive)
    n = cfg.num_snakes

    # walls intact: border is WALL forever
    assert (tcell[0] == T.WALL).all() and (tcell[-1] == T.WALL).all()
    assert (tcell[:, 0] == T.WALL).all() and (tcell[:, -1] == T.WALL).all()

    for i in range(n):
        cells = (owner == i) & (tcell >= T.HEAD)
        heads = (tcell == T.HEAD) & (owner == i)
        tails = (tcell == T.TAIL) & (owner == i)
        if alive[i]:
            # exactly one head and one tail on the grid
            assert heads.sum() == 1, f'snake {i} heads t={t}'
            assert tails.sum() == 1, f'snake {i} tails t={t}'
            # grid body size == ring length + 1
            expect = int(np.asarray(state.ring_len)[i]) + 1
            assert cells.sum() == expect, \
                f'snake {i} cells={cells.sum()} ring={expect} t={t}'
            # head/tail coords match the state
            hr, hc = np.argwhere(heads)[0]
            assert (hr, hc) == tuple(np.asarray(state.head)[i]), t
            tr, tc = np.argwhere(tails)[0]
            assert (tr, tc) == tuple(np.asarray(state.tail)[i]), t
            # walking the ring from head reaches tail through body cells
            pos = np.asarray(state.head)[i].copy()
            cap = cfg.body_capacity
            ring = np.asarray(
                ring_slots(np.asarray(state.ring)[i], cap))
            rh = int(np.asarray(state.ring_head)[i])
            rl = int(np.asarray(state.ring_len)[i])
            for j in range(rl):
                d = ring[(rh + j) % cap]
                pos = pos - T.DIR_DELTA[d]
                assert cells[pos[0], pos[1]], f'ring walk t={t}'
            assert (pos == np.asarray(state.tail)[i]).all(), t
        else:
            # dead snakes leave no cells behind
            assert cells.sum() == 0, f'dead snake {i} cells t={t}'


@pytest.mark.parametrize('cfg', [
    EnvConfig(height=10, width=10, num_snakes=2, snake_length=3,
              num_fruits=2),
    EnvConfig(height=14, width=14, num_snakes=4, snake_length=4,
              num_fruits=3),
    EnvConfig(height=14, width=14, num_snakes=4, snake_length=4,
              num_fruits=3, spawn_mode='procedural'),
])
def test_invariants_random_rollout(cfg):
    env = make_env(cfg)
    state, _ = env.reset(jax.random.key(0))
    rng = np.random.default_rng(0)
    check_invariants(cfg, state, -1)
    for t in range(150):
        acts = jnp.asarray(rng.integers(0, 3, size=cfg.num_snakes))
        state, out = env.step(state, acts)
        check_invariants(cfg, state, t)


def test_alive_count_vs_flags():
    # alive_count mirrors the reference's (quirky) arithmetic and must
    # never exceed the true alive flag count
    cfg = EnvConfig(height=10, width=10, num_snakes=4, snake_length=3,
                    num_fruits=3)
    env = make_env(cfg)
    state, _ = env.reset(jax.random.key(1))
    rng = np.random.default_rng(1)
    for t in range(120):
        acts = jnp.asarray(rng.integers(0, 3, size=4))
        state, out = env.step(state, acts)
        assert int(state.alive_count) <= int(np.asarray(
            state.alive).sum())
