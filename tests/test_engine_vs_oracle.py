"""Cross-validation: the vectorized TPU engine vs the independent numpy
oracle must produce bit-identical trajectories under the shared key
schedule. This is the primary correctness gate for the §2.4 parity
contract (grids, rewards, dones, episodic stats, obs, ranks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.env import make_env
from marlsnake_tpu.oracle import OracleEnv


CONFIGS = [
    EnvConfig(height=10, width=10, num_snakes=1, snake_length=3,
              num_fruits=1),
    EnvConfig(height=10, width=10, num_snakes=2, snake_length=3,
              num_fruits=2),
    EnvConfig(height=20, width=20, num_snakes=4, snake_length=3,
              num_fruits=3),
    EnvConfig(height=20, width=20, num_snakes=4, snake_length=5,
              num_fruits=3, vision_range=5, frame_stack=2),
    # full-obs frame_stack exercises the raw-grid history path
    # (engine._hist_mode: history frames re-encoded at obs time)
    EnvConfig(height=12, width=12, num_snakes=4, snake_length=3,
              num_fruits=2, frame_stack=3),
    EnvConfig(height=12, width=12, num_snakes=3, snake_length=3,
              num_fruits=2, done_mode='any'),
    EnvConfig(height=12, width=12, num_snakes=4, snake_length=3,
              num_fruits=2, observer='human'),
    EnvConfig(height=10, width=10, num_snakes=2, snake_length=3,
              num_fruits=2, max_episode_steps=17),
    EnvConfig(height=16, width=16, num_snakes=4, snake_length=3,
              num_fruits=0,
              rewards=(1.0, 2.0, -3.0, 4.0, 0.1)),
    # n>=5: the phase-3 double-decrement quirk can drive alive_count to 1
    # with several snakes alive — exercises the first-alive-only win mask
    # (engine phase 4 vs snake_env.py:347-352); win reward nonzero so a
    # wrong mask shows up in the reward stream
    EnvConfig(height=14, width=14, num_snakes=5, snake_length=3,
              num_fruits=4, rewards=(10.0, 7.0, -3.0, 5.0, -0.01)),
    EnvConfig(height=16, width=16, num_snakes=6, snake_length=3,
              num_fruits=5, rewards=(10.0, 7.0, -3.0, 5.0, -0.01)),
    # procedural (arithmetic on-device) spawn mode: the oracle mirrors
    # engine._procedural_spawn's key schedule bit-exactly
    EnvConfig(height=20, width=20, num_snakes=4, snake_length=3,
              num_fruits=3, spawn_mode='procedural'),
    # orientation-diverse family: vertical segments opt in via
    # spawn_orientations='both' (bands here are 4 >= k rows tall)
    EnvConfig(height=20, width=20, num_snakes=4, snake_length=3,
              num_fruits=3, spawn_mode='procedural',
              spawn_orientations='both'),
    EnvConfig(height=10, width=10, num_snakes=2, snake_length=3,
              num_fruits=2, spawn_mode='procedural',
              spawn_orientations='both'),
    # bands with leftover rows (h-2=9 rows, 4 snakes -> b=2, 1 unused)
    # + vision crop on top of procedural spawns
    EnvConfig(height=11, width=13, num_snakes=4, snake_length=4,
              num_fruits=2, spawn_mode='procedural', vision_range=3),
]


def run_pair(cfg, seed, steps=120):
    env = make_env(cfg)
    oracle = OracleEnv(cfg, rng_mode='jax')
    key = jax.random.key(seed)
    state, obs_e = env.reset(key)
    obs_o = oracle.reset(key=key)
    np.testing.assert_array_equal(np.asarray(obs_e), obs_o,
                                  err_msg='reset obs mismatch')
    np.testing.assert_array_equal(np.asarray(state.grid), oracle.grid,
                                  err_msg='reset grid mismatch')

    rng = np.random.default_rng(seed + 1)
    for t in range(steps):
        actions = rng.integers(0, cfg.num_actions, size=cfg.num_snakes)
        state, out = env.step(state, jnp.asarray(actions))
        obs_o, rews_o, dones_o, info_o = oracle.step(actions)

        np.testing.assert_array_equal(
            np.asarray(state.grid), oracle.grid,
            err_msg=f'grid mismatch at t={t}')
        np.testing.assert_allclose(
            np.asarray(out.reward), np.asarray(rews_o, dtype=np.float32),
            rtol=0, atol=1e-6, err_msg=f'reward mismatch at t={t}')
        np.testing.assert_array_equal(
            np.asarray(out.done), np.asarray(dones_o),
            err_msg=f'done mismatch at t={t}')
        np.testing.assert_array_equal(
            np.asarray(out.obs), obs_o, err_msg=f'obs mismatch at t={t}')
        np.testing.assert_array_equal(
            np.asarray([s.alive for s in oracle.snakes]),
            np.asarray(state.alive), err_msg=f'alive mismatch at t={t}')
        assert int(state.alive_count) == oracle.alive_count, f't={t}'

        if info_o:
            assert bool(out.done_all)
            np.testing.assert_array_equal(np.asarray(out.rank),
                                          info_o['rank'])
            np.testing.assert_allclose(
                np.asarray(out.episode_scores),
                info_o['episode_scores'].astype(np.float32), atol=1e-4,
                rtol=1e-5)
            np.testing.assert_allclose(
                np.asarray(out.episode_steps),
                info_o['episode_steps'].astype(np.float32), atol=0)
            np.testing.assert_allclose(
                np.asarray(out.episode_fruits),
                info_o['episode_fruits'].astype(np.float32), atol=0)
            np.testing.assert_allclose(
                np.asarray(out.episode_kills),
                info_o['episode_kills'].astype(np.float32), atol=0)
        else:
            assert not bool(out.done_all)
        # engine's post-done stat reset must mirror the oracle's
        np.testing.assert_allclose(np.asarray(state.epi_scores),
                                   oracle.epi_scores.astype(np.float32),
                                   atol=1e-4, rtol=1e-5,
                                   err_msg=f'epi_scores t={t}')


@pytest.mark.parametrize('ci', range(len(CONFIGS)))
@pytest.mark.parametrize('seed', [0, 7])
def test_engine_matches_oracle(ci, seed):
    run_pair(CONFIGS[ci], seed)


def test_long_rollout_many_episodes():
    # drive through many episode boundaries on a small board
    cfg = EnvConfig(height=8, width=8, num_snakes=2, snake_length=3,
                    num_fruits=2)
    run_pair(cfg, seed=3, steps=400)
