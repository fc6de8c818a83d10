"""Vectorized environments: vmap over a batched EnvState PyTree.

This subsumes the reference's process-per-env ``AsyncVectorMultiEnv``
(wrappers.py:126-194): instead of fork workers + POSIX shared memory, the
batch of env states lives as device arrays and one jitted program steps all
envs. Auto-reset mirrors the reference worker's behavior
(wrappers.py:141-143): when an env's episode-done predicate fires, the env
is reset and the RESET observation is returned in place of the terminal one
(rewards/dones/info still describe the finished step).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from marlsnake_tpu.core import engine
from marlsnake_tpu.core.spawn import SpawnData, spawn_data
from marlsnake_tpu.core.state import EnvState
from marlsnake_tpu.core.types import EnvConfig

_RESET_SALT = 0x5EED


def build_vector_fns(cfg: EnvConfig, autoreset: bool = True):
    """Return (reset_fn, step_fn) pure functions over batched states.

    ``reset_fn(keys) -> (states, obs)`` with keys of shape (B,);
    ``step_fn(states, actions) -> (states, StepOutput)`` with actions (B, N).
    Both are unjitted so they compose into larger jitted/sharded programs.
    """
    if cfg.spawn_mode == 'procedural':
        # arithmetic on-device spawn: no host enumeration, no pool, no
        # per-reset row gather (engine._procedural_spawn)
        spawn = None
    else:
        sd = spawn_data(cfg.height, cfg.width, cfg.snake_length,
                        cfg.num_snakes, pool_size=cfg.spawn_pool_size,
                        map_layout=cfg.map_layout)
        spawn = SpawnData(jnp.asarray(sd.cells),
                          None if sd.blob is None else jnp.asarray(sd.blob))
    reset1 = functools.partial(engine.reset, cfg, spawn)
    if autoreset:
        # Fused step+reset with an unconditional per-env select: at batch
        # sizes where this path matters some env finishes nearly every
        # step, so a lax.cond would take the reset branch anyway while
        # adding barriers (~1.7ms/step at 4096 envs in device traces) and
        # a second obs encode.
        step1 = functools.partial(engine.step_autoreset, cfg, spawn,
                                  reset_salt=_RESET_SALT)
    else:
        step1 = functools.partial(engine.step, cfg)

    def reset_fn(keys):
        return jax.vmap(reset1)(keys)

    def step_fn(states, actions):
        return jax.vmap(step1)(states, actions)

    return reset_fn, step_fn


def build_graph_vector_fns(cfg: EnvConfig, autoreset: bool = True):
    """Vectorized GraphSnakeEnv: batched ray-feature observations
    (B, N, 5, C) in place of the grid obs (see envs/graph.py).

    For frame_stack=1 the rays derive straight from the carried GRID
    (ops/rays.ray_features_from_grid — exact: obs is a pure function of
    the grid, and both step and autoreset return the state the obs was
    encoded from), so the (B, N, H, W, 8) obs encode is dead code and
    XLA eliminates it; the obs-gather form it replaces lowered to a
    serialized kCustom dynamic gather (293k -> measured in
    bench_table's graph row)."""
    from marlsnake_tpu.ops.rays import (ray_features,
                                        ray_features_from_grid,
                                        use_grid_rays)

    if cfg.obs_format != 'uint8' and not use_grid_rays(cfg):
        raise ValueError(
            "obs_format='packed' needs the grid-rays fast path; the "
            'fallback ray transform reads uint8 channel planes '
            '(ops/rays.ray_features)')
    reset_fn, step_fn = build_vector_fns(cfg, autoreset)

    if use_grid_rays(cfg):
        grays = jax.vmap(functools.partial(ray_features_from_grid, cfg))

        def reset_g(keys):
            states, _ = reset_fn(keys)
            return states, grays(states.grid, states.head,
                                 states.direction, states.alive,
                                 states.hist_grid)

        def step_g(states, actions):
            states, out = step_fn(states, actions)
            proc = grays(states.grid, states.head, states.direction,
                         states.alive, states.hist_grid)
            return states, out.replace(obs=proc)

        return reset_g, step_g

    rays = jax.vmap(functools.partial(ray_features, cfg))

    def reset_g(keys):
        states, obs = reset_fn(keys)
        return states, rays(obs, states.head, states.direction,
                            states.alive)

    def step_g(states, actions):
        states, out = step_fn(states, actions)
        proc = rays(out.obs, states.head, states.direction, states.alive)
        return states, out.replace(obs=proc)

    return reset_g, step_g


class VectorSnakeEnv:
    """Jitted batched environment (single host / single device).

    For multi-device sharding see ``marlsnake_tpu.parallel``. Pass
    ``graph=True`` for batched ray-feature observations.
    """

    def __init__(self, cfg: EnvConfig, num_envs: int,
                 autoreset: bool = True, graph: bool = False):
        self.cfg = cfg
        self.num_envs = num_envs
        self.autoreset = autoreset
        self.graph = graph
        if graph:
            reset_fn, step_fn = build_graph_vector_fns(cfg, autoreset)
        else:
            reset_fn, step_fn = build_vector_fns(cfg, autoreset)
        self._reset = jax.jit(reset_fn)
        self._step = jax.jit(step_fn)

    def reset(self, key) -> Tuple[EnvState, jnp.ndarray]:
        keys = jax.random.split(key, self.num_envs)
        return self._reset(keys)

    def step(self, states: EnvState,
             actions) -> Tuple[EnvState, engine.StepOutput]:
        return self._step(states, jnp.asarray(actions))

    @property
    def obs_shape(self):
        if self.graph:
            return (self.num_envs, self.cfg.num_snakes, 5,
                    self.cfg.obs_channels)
        return (self.num_envs,) + self.cfg.obs_shape

    @property
    def num_actions(self) -> int:
        return self.cfg.num_actions
