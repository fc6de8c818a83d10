"""Single-environment functional bundle.

The reference exposes environments as mutable ``gym.Env`` objects built via
``gym.make`` (envs/__init__.py:1-16); here an env is a *bundle of pure
functions* closed over a static :class:`EnvConfig` plus the pre-enumerated
spawn-candidate table. ``reset``/``step`` are jitted and safe to ``vmap``.

Env variants map to configs rather than subclasses:

* ``Snake-v1``      -> ``EnvConfig(done_mode='all')``
* ``SnakeCoop-v1``  -> ``EnvConfig(done_mode='any')``  (coop_snake_env.py:4-22)
* ``SnakeGraph-v1`` -> ray-feature obs transform (see envs/graph.py)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from marlsnake_tpu.core import engine
from marlsnake_tpu.core.spawn import (
    SpawnData, spawn_candidates, spawn_data)
from marlsnake_tpu.core.state import EnvState
from marlsnake_tpu.core.types import EnvConfig


class SnakeEnv:
    """Pure-functional snake environment.

    Usage::

        env = make_env(EnvConfig(height=20, width=20, num_snakes=4))
        state, obs = env.reset(jax.random.key(0))
        state, out = env.step(state, actions)   # out: StepOutput
    """

    def __init__(self, cfg: EnvConfig):
        self.cfg = cfg
        if cfg.map_layout is not None:
            from marlsnake_tpu.core.maps import parse_layout
            interior = int((~parse_layout(cfg.map_layout)).sum())
        else:
            interior = (cfg.height - 2) * (cfg.width - 2)
        if cfg.num_snakes * cfg.snake_length > interior:
            # The reference's rejection loop (snake_env.py:579-585) hangs
            # forever on infeasible configs; fail fast instead.
            raise ValueError(
                f'{cfg.num_snakes} snakes of length {cfg.snake_length} '
                f'cannot fit on a {cfg.height}x{cfg.width} board '
                f'({interior} interior cells)')
        if cfg.spawn_mode == 'procedural':
            # arithmetic on-device spawn: nothing to enumerate on host
            self.candidates = None
            self.spawn = None
        else:
            self.candidates = spawn_candidates(
                cfg.height, cfg.width, cfg.snake_length, cfg.map_layout)
            if self.candidates.shape[0] == 0:
                raise ValueError(
                    'no valid spawn positions for this config')
            sd = spawn_data(cfg.height, cfg.width, cfg.snake_length,
                            cfg.num_snakes, pool_size=cfg.spawn_pool_size,
                            map_layout=cfg.map_layout)
            self.spawn = SpawnData(
                jnp.asarray(sd.cells),
                None if sd.blob is None else jnp.asarray(sd.blob))
        self._reset = jax.jit(
            functools.partial(engine.reset, cfg, self.spawn))
        self._step = jax.jit(functools.partial(engine.step, cfg))

    # --- pure API ---------------------------------------------------------
    def reset(self, key) -> Tuple[EnvState, jnp.ndarray]:
        return self._reset(key)

    def step(self, state: EnvState,
             actions) -> Tuple[EnvState, engine.StepOutput]:
        return self._step(state, jnp.asarray(actions))

    # Unjitted variants for composing into larger jitted programs.
    def reset_fn(self, key):
        return engine.reset(self.cfg, self.spawn, key)

    def step_fn(self, state, actions):
        return engine.step(self.cfg, state, actions)

    # --- specs ------------------------------------------------------------
    @property
    def num_snakes(self) -> int:
        return self.cfg.num_snakes

    @property
    def obs_shape(self):
        return self.cfg.obs_shape

    @property
    def num_actions(self) -> int:
        """Per-agent action count (3 for 'snake', 5 for 'human')."""
        return self.cfg.num_actions

    @property
    def obs_dtype(self):
        import numpy as np
        return np.uint8


def make_env(cfg: Optional[EnvConfig] = None, **kwargs) -> SnakeEnv:
    """Build an env from a config or reference-style kwargs.

    Accepts the reference ``SnakeEnv.__init__`` kwargs
    (``height, width, num_snakes, snake_length, vision_range, frame_stack,
    observer, reward_dict, num_fruits, max_episode_steps``).
    """
    if cfg is None:
        reward_dict = kwargs.pop('reward_dict', None)
        if 'num_fruits' not in kwargs:
            kwargs['num_fruits'] = -1
        if 'map' in kwargs:  # bundled map name or path
            from marlsnake_tpu.core.maps import load_layout
            kwargs['map_layout'] = load_layout(kwargs.pop('map'))
        cfg = EnvConfig.from_reward_dict(reward_dict, **kwargs)
    return SnakeEnv(cfg)
