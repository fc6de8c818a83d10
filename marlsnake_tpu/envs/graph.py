"""GraphSnakeEnv: SnakeEnv with ray-feature observations.

Functional equivalent of the reference ``GraphSnakeEnv``
(envs/graph_snake_env.py:18-97): identical dynamics, observations
post-processed into 5 distance-weighted rays per snake.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax

from marlsnake_tpu.core import engine
from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.env import SnakeEnv
from marlsnake_tpu.ops.rays import (ray_features, ray_features_from_grid,
                                    use_grid_rays)


class GraphSnakeEnv(SnakeEnv):
    """Emits (num_snakes, 5, 8*frame_stack) float32 ray observations.

    Unlike the reference (which drops dead snakes' rows, yielding a
    variable-shape obs — graph_snake_env.py:62-64), rows are fixed-shape
    with zeros for dead snakes.
    """

    def __init__(self, cfg: EnvConfig):
        if cfg.observer != 'snake':
            raise ValueError(
                "GraphSnakeEnv supports only observer='snake' "
                '(same restriction as graph_snake_env.py:47-49)')
        super().__init__(cfg)
        self._reset_g = jax.jit(functools.partial(self._reset_impl))
        self._step_g = jax.jit(functools.partial(self._step_impl))

    def _rays(self, state, obs):
        # derive rays from the carried grid(s) where possible (exact;
        # kills the TPU-hostile obs dynamic-gather — see ops/rays.py);
        # covers frame_stack > 1 via the raw-grid history carry
        if use_grid_rays(self.cfg):
            return ray_features_from_grid(
                self.cfg, state.grid, state.head, state.direction,
                state.alive, state.hist_grid)
        return ray_features(self.cfg, obs, state.head, state.direction,
                            state.alive)

    def _reset_impl(self, key):
        state, obs = engine.reset(self.cfg, self.spawn, key)
        return state, self._rays(state, obs)

    def _step_impl(self, state, actions):
        state, out = engine.step(self.cfg, state, actions)
        return state, out.replace(obs=self._rays(state, out.obs))

    def reset(self, key):
        return self._reset_g(key)

    def step(self, state, actions) -> Tuple:
        import jax.numpy as jnp
        return self._step_g(state, jnp.asarray(actions))

    @property
    def obs_shape(self):
        return (self.cfg.num_snakes, 5, self.cfg.obs_channels)

    @property
    def obs_dtype(self):
        import numpy as np
        return np.float32
