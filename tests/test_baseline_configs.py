"""The BASELINE.json benchmark configs must all construct and run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.env import make_env
from marlsnake_tpu.envs.vector import VectorSnakeEnv


def test_config_single_10x10_one_snake():
    env = make_env(EnvConfig(height=10, width=10, num_snakes=1,
                             snake_length=3))
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (1, 10, 10, 8)


def test_config_readme_default_vision():
    env = make_env(EnvConfig(height=20, width=20, num_snakes=4,
                             snake_length=3, vision_range=5))
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (4, 11, 11, 8)


def test_config_256_vectorized_custom_rewards():
    cfg = EnvConfig.from_reward_dict(
        {'fruit': 5.0, 'kill': 1.0, 'lose': -2.0, 'win': 3.0,
         'time': -0.01},
        height=20, width=20, num_snakes=4, snake_length=3, num_fruits=-1)
    venv = VectorSnakeEnv(cfg, num_envs=256)
    states, obs = venv.reset(jax.random.key(0))
    assert obs.shape == (256, 4, 20, 20, 8)
    states, out = venv.step(states, np.zeros((256, 4), np.int32))
    assert out.reward.shape == (256, 4)


def test_config_30x30_8_snakes_framestack4_walls():
    from marlsnake_tpu.core.maps import load_layout
    # the same bundled walls layout bench_table.py measures (BASELINE
    # configs[3] row '30x30walls_x8_framestack4')
    cfg = EnvConfig(height=30, width=30, num_snakes=8, snake_length=3,
                    frame_stack=4, map_layout=load_layout('30x30_pillars'))
    venv = VectorSnakeEnv(cfg, num_envs=8)
    states, obs = venv.reset(jax.random.key(0))
    assert obs.shape == (8, 8, 30, 30, 32)
    rng = np.random.default_rng(0)
    for _ in range(5):
        states, out = venv.step(
            states, jnp.asarray(rng.integers(0, 3, size=(8, 8))))
    assert out.obs.dtype == np.uint8
