"""Scripted edge-case parity corpus (SURVEY.md §2.4 quirks).

Each test ENGINEERS one of the reference's nastiest step-phase quirks with
a deterministic construction — chosen spawn paths and a hand-written action
script — instead of hoping random play stumbles into it. The ACTUAL
reference env runs the scenario (spawn/fruit randomness replaced by the
scripted cells — the same exogenous-randomness seam the replay gate uses),
the jitted engine replays the identical cells, and every step must match
bit-exactly. On top of parity, each test asserts the quirk's observable on
the ENGINE outputs, so it fails if the quirk's branch is removed from the
engine even if both sides drifted together.

Quirks covered (reference snake_env.py:334-352, 521-544, 385-394):
* swap-through: both heads move through each other -> both die, BOTH get
  kill credit (snake_env.py:537-538);
* tail-chase onto an eater's tail: tail stays because the owner ate a
  fruit, the chaser dies, the owner gets the kill (snake_env.py:338-346)
  — plus the no-fruit control where the chaser survives;
* >=2 heads on one fruit cell: all die, NO kill credit, the fruit still
  counts as taken and respawns (snake_env.py:528-536);
* self-collision: the snake gets kill credit for its own death
  (snake_env.py:537-538);
* win flag re-set EVERY step for the sole survivor (snake_env.py:347-352);
* timeout forces all dones and the dying step's stats are masked out of
  the episodic totals (snake_env.py:385-394).
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
    from ref_shim import load_reference_snake_env
    RefSnakeEnv = load_reference_snake_env()
    from marlenv.core.snake import Snake as RefSnake
    HAVE_REF = True
except Exception:  # reference tree not mounted
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason='reference repo not available')

# distinct values so each reward term is separable in the observables
REWARDS = {'fruit': 10.0, 'kill': 7.0, 'lose': -3.0, 'win': 5.0,
           'time': -0.01}


def canon_engine_grid(grid):
    g = np.asarray(grid)
    return T.cell_type(g) + 10 * T.cell_owner(g)


class Scenario:
    """Reference env + jitted engine driven by the same scripted
    spawn/fruit cells; ``step`` asserts bit-exact parity and returns the
    engine's StepOutput for quirk assertions."""

    def __init__(self, spawns, fruit_queue, **cfg_kwargs):
        params = dict(height=12, width=12, num_snakes=len(spawns),
                      snake_length=len(spawns[0]), num_fruits=1,
                      reward_dict=dict(REWARDS))
        params.update(cfg_kwargs)
        self.cfg = EnvConfig.from_reward_dict(params.pop('reward_dict'),
                                              **params)
        self.w = self.cfg.width
        self.fruit_queue = list(fruit_queue)

        self.ref = RefSnakeEnv(reward_dict=dict(REWARDS), **params)
        # replace ONLY the randomness sources with the scripted cells;
        # every step/collision/reward branch is the reference's own code
        self.ref._generate_snakes = lambda: [
            RefSnake(i, [tuple(c) for c in coords])
            for i, coords in enumerate(spawns)]
        self.ref._generate_fruits = self._feed_fruits

        dead_key = jax.random.key(0)
        self._reset_fn = jax.jit(lambda sc, fc: engine.reset(
            self.cfg, None, dead_key, spawn_cells=sc, fruit_cells=fc))
        self._step_fn = jax.jit(functools.partial(engine.step, self.cfg))

        obs_r = self.ref.reset()
        sc = np.asarray([[r * self.w + c for (r, c) in coords]
                         for coords in spawns], np.int32)
        fc = np.flatnonzero(np.asarray(self.ref.grid).reshape(-1) == 2)
        fc = fc.astype(np.int32)[:max(self.cfg.resolved_num_fruits, 1)]
        self.state, obs_e = self._reset_fn(jnp.asarray(sc),
                                           jnp.asarray(fc))
        np.testing.assert_array_equal(canon_engine_grid(self.state.grid),
                                      self.ref.grid, err_msg='reset grid')
        np.testing.assert_array_equal(np.asarray(obs_e), np.asarray(obs_r),
                                      err_msg='reset obs')

    def _feed_fruits(self, num_fruits=1):
        if not num_fruits:
            return None, None
        assert len(self.fruit_queue) >= num_fruits, \
            'scenario script ran out of fruit cells'
        take = [self.fruit_queue.pop(0) for _ in range(num_fruits)]
        return (np.asarray([t[0] for t in take]),
                np.asarray([t[1] for t in take]))

    def step(self, actions):
        fruits_before = set(np.flatnonzero(
            np.asarray(self.ref.grid).reshape(-1) == 2).tolist())
        obs_r, rews_r, dones_r, info_r = self.ref.step(list(actions))
        fruits_after = set(np.flatnonzero(
            np.asarray(self.ref.grid).reshape(-1) == 2).tolist())
        fc = np.full((self.cfg.num_snakes,), -1, np.int32)
        new = sorted(fruits_after - fruits_before)
        fc[:len(new)] = new

        self.state, out = self._step_fn(
            self.state, jnp.asarray(np.asarray(actions, np.int32)),
            jnp.asarray(fc))

        np.testing.assert_array_equal(canon_engine_grid(self.state.grid),
                                      self.ref.grid, err_msg='grid')
        np.testing.assert_array_equal(np.asarray(out.obs),
                                      np.asarray(obs_r), err_msg='obs')
        np.testing.assert_allclose(np.asarray(out.reward),
                                   np.asarray(rews_r, np.float32),
                                   rtol=0, atol=1e-6, err_msg='reward')
        np.testing.assert_array_equal(np.asarray(out.done),
                                      np.asarray(dones_r), err_msg='done')
        assert bool(out.done_all) == bool(info_r), 'done_all'
        if info_r:
            np.testing.assert_array_equal(np.asarray(out.rank),
                                          np.asarray(info_r['rank']))
            for key in ('episode_scores', 'episode_steps',
                        'episode_fruits', 'episode_kills'):
                np.testing.assert_allclose(
                    np.asarray(getattr(out, key)),
                    info_r[key].astype(np.float32), atol=1e-4,
                    err_msg=key)
        return out, info_r


def test_swap_through_double_kill():
    """Two heads swap through each other: both die AND both get kill
    credit (the hit cell is the other's HEAD; snake_env.py:537-538)."""
    sc = Scenario(
        spawns=[[(5, 5), (5, 4), (5, 3)],    # s0 heading RIGHT
                [(5, 6), (5, 7), (5, 8)]],   # s1 heading LEFT
        fruit_queue=[(10, 10)])
    out, info = sc.step([0, 0])
    assert np.asarray(out.done).tolist() == [True, True]
    # reward = lose + kill (no time term: alive=False on the dying step)
    np.testing.assert_allclose(
        np.asarray(out.reward),
        [REWARDS['lose'] + REWARDS['kill']] * 2, atol=1e-6)
    # the dying step's stats are masked: kills never reach the totals
    np.testing.assert_array_equal(np.asarray(out.episode_kills), [0, 0])


def test_tail_chase_onto_eaters_tail():
    """Chaser moves onto a tail whose owner eats a fruit the same step:
    the tail stays, the chaser dies, the eater gets the kill
    (snake_env.py:338-346)."""
    sc = Scenario(
        spawns=[[(6, 8), (7, 8), (8, 8)],    # s0 chaser heading UP
                [(5, 6), (5, 7), (5, 8)]],   # s1 eater heading LEFT
        fruit_queue=[(5, 5),     # initial fruit: s1's next head cell
                     (10, 10)])  # respawn after s1 eats
    out, info = sc.step([0, 0])
    assert np.asarray(out.done).tolist() == [True, False]
    np.testing.assert_allclose(np.asarray(out.reward)[0],
                               REWARDS['lose'], atol=1e-6)
    # eater: time + fruit + kill + win (sole survivor this same step)
    np.testing.assert_allclose(
        np.asarray(out.reward)[1],
        REWARDS['time'] + REWARDS['fruit'] + REWARDS['kill']
        + REWARDS['win'], atol=1e-6)


def test_tail_chase_control_tail_retracts():
    """Control: same chase but NO fruit — the tail retracts and the
    chaser survives (TAIL is excluded from the deadly set)."""
    sc = Scenario(
        spawns=[[(6, 8), (7, 8), (8, 8)],
                [(5, 6), (5, 7), (5, 8)]],
        fruit_queue=[(10, 10)])
    out, info = sc.step([0, 0])
    assert np.asarray(out.done).tolist() == [False, False]
    np.testing.assert_allclose(np.asarray(out.reward),
                               [REWARDS['time']] * 2, atol=1e-6)


def test_two_heads_on_fruit_cell():
    """>=2 heads landing on one FRUIT cell: all die, NO kill credit, the
    fruit still counts as taken and respawns (snake_env.py:528-536)."""
    sc = Scenario(
        spawns=[[(5, 4), (5, 3), (5, 2)],    # s0 heading RIGHT
                [(5, 6), (5, 7), (5, 8)]],   # s1 heading LEFT
        fruit_queue=[(5, 5),     # initial fruit: the contested cell
                     (9, 9)])    # the taken fruit's respawn
    out, info = sc.step([0, 0])
    assert np.asarray(out.done).tolist() == [True, True]
    # lose only — no kill credit, no fruit reward
    np.testing.assert_allclose(np.asarray(out.reward),
                               [REWARDS['lose']] * 2, atol=1e-6)
    # quirk: the contested fruit counts as TAKEN (a replacement spawns at
    # the scripted cell) even though nobody ate it — the dead movers never
    # reach the cell, so the original fruit stays on the grid too
    grid = canon_engine_grid(sc.state.grid)
    assert grid[5, 5] == 2 and grid[9, 9] == 2


def test_self_collision_self_kill_credit():
    """Turning into your own body credits YOUR OWN kill counter: reward =
    lose + kill on the same step (snake_env.py:537-538)."""
    sc = Scenario(
        spawns=[[(5, 5), (5, 4), (6, 4), (6, 5), (6, 6)],  # hook, RIGHT
                [(9, 5), (9, 4), (9, 3), (9, 2), (9, 1)]],
        fruit_queue=[(10, 10)])
    out, info = sc.step([2, 0])  # s0 turns right (RIGHT -> DOWN) into body
    assert np.asarray(out.done).tolist() == [True, False]
    np.testing.assert_allclose(np.asarray(out.reward)[0],
                               REWARDS['lose'] + REWARDS['kill'],
                               atol=1e-6)


def test_win_flag_reset_every_step():
    """The sole survivor gets win=True (and the win reward) EVERY step
    after the others die, not just once (snake_env.py:347-352)."""
    sc = Scenario(
        spawns=[[(1, 2), (2, 2), (3, 2)],    # s0 heading UP at the wall
                [(8, 5), (8, 4), (8, 3)]],   # s1 heading RIGHT, open row
        fruit_queue=[(10, 10)])
    out, _ = sc.step([0, 0])  # s0 head (1,2) -> (0,2) border wall: dies
    assert np.asarray(out.done).tolist() == [True, False]
    for _ in range(3):  # survivor keeps earning win every step
        out, _ = sc.step([0, 0])
        np.testing.assert_allclose(
            np.asarray(out.reward)[1],
            REWARDS['time'] + REWARDS['win'], atol=1e-6)


def test_win_first_alive_only_double_decrement():
    """The double-decrement quirk drives alive_count to 1 while THREE
    snakes are actually alive; the reference then sets win on the FIRST
    alive snake only (snake_env.py:347-352 breaks after one).

    Construction (num_snakes=5): s2 eats a fruit while s3 and s4 both
    target s2's old tail. The two chasers multi-collide (phase-2 death,
    -2) AND each counts again in the tail-chase pass (phase-3, -2,
    snake_env.py:334-346 never dedups) -> alive_count = 5 - 4 = 1 with
    s0, s1, s2 alive. Only s0 (lowest alive index) may earn the win
    reward."""
    sc = Scenario(
        spawns=[[(2, 2), (2, 3), (2, 4)],    # s0 bystander, LEFT
                [(9, 2), (9, 3), (9, 4)],    # s1 bystander, LEFT
                [(5, 6), (5, 7), (5, 8)],    # s2 eater, LEFT onto fruit
                [(4, 8), (3, 8), (2, 8)],    # s3 chaser, DOWN onto tail
                [(6, 8), (7, 8), (8, 8)]],   # s4 chaser, UP onto tail
        fruit_queue=[(5, 5),     # initial fruit: s2's next head cell
                     (10, 10)])  # respawn after s2 eats
    out, info = sc.step([0, 0, 0, 0, 0])
    assert np.asarray(out.done).tolist() == [False, False, False,
                                             True, True]
    rew = np.asarray(out.reward)
    # s0: time + win (first alive); s1/s2 alive but NO win
    np.testing.assert_allclose(rew[0], REWARDS['time'] + REWARDS['win'],
                               atol=1e-6)
    np.testing.assert_allclose(rew[1], REWARDS['time'], atol=1e-6)
    # s2: time + fruit + 2 chase kills (one per chaser), no win
    np.testing.assert_allclose(
        rew[2], REWARDS['time'] + REWARDS['fruit'] + 2 * REWARDS['kill'],
        atol=1e-6)
    # chasers: multi-collision, lose only (no kill credit for multi)
    np.testing.assert_allclose(rew[3:], [REWARDS['lose']] * 2, atol=1e-6)
    # the quirk itself: the counter reads 1 with three snakes alive
    assert int(sc.state.alive_count) == 1
    assert np.asarray(sc.state.alive).tolist() == [True, True, True,
                                                   False, False]
    # and win keeps landing on s0 ONLY on subsequent steps (bystanders
    # turn left away from the border wall they now face)
    out, _ = sc.step([1, 1, 0, 0, 0])
    rew = np.asarray(out.reward)
    np.testing.assert_allclose(rew[0], REWARDS['time'] + REWARDS['win'],
                               atol=1e-6)
    np.testing.assert_allclose(rew[1], REWARDS['time'], atol=1e-6)


def test_timeout_masks_dying_step_stats():
    """At max_episode_steps all dones are forced; the final (dying) step's
    reward/steps are EXCLUDED from the episodic totals
    (snake_env.py:385-394)."""
    sc = Scenario(
        spawns=[[(5, 5), (5, 4), (5, 3)],    # RIGHT, open row
                [(8, 5), (8, 4), (8, 3)]],
        fruit_queue=[(10, 10)], max_episode_steps=4)
    for t in range(3):
        out, info = sc.step([0, 0])
        assert not info
    out, info = sc.step([0, 0])  # step 4: timeout forces done
    assert np.asarray(out.done).tolist() == [True, True]
    assert info
    # snakes were alive through the timeout step, but the forced-done
    # masking keeps time rewards accumulating (dones list is forced AFTER
    # stat accumulation): steps == 4, scores == 4 * time
    np.testing.assert_array_equal(np.asarray(out.episode_steps), [4, 4])
    np.testing.assert_allclose(np.asarray(out.episode_scores),
                               [4 * REWARDS['time']] * 2, atol=1e-5)
