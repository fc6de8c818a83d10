"""Data-parallel distributed DQN over a device mesh.

Scaling model (SURVEY.md §2.3): the env batch and the replay buffer are
sharded over the mesh ``data`` axis (each device owns ``num_envs/ndev``
envs and a local replay shard — the ApeX-style layout); learner parameters
and optimizer state are replicated, and gradients are ``pmean``-reduced
over ICI inside the jitted episode program. Observations never leave the
device: the learner consumes the sharded env outputs directly, which is
what replaces the reference's shared-memory obs transport
(wrappers.py:136-145).

Works identically on a real multi-chip slice and on the fake-distributed
CPU mesh (``--xla_force_host_platform_device_count=N``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from marlsnake_tpu.algo import replay
from marlsnake_tpu.algo.dqn_trainer import (DQNConfig, DQNTrainer,
                                            TrainState)


def _state_specs(ts: TrainState) -> TrainState:
    """PartitionSpec pytree: replay shards over 'data', rest replicated."""
    specs = jax.tree.map(lambda _: P(), ts)
    buf_specs = jax.tree.map(lambda _: P('data'), ts.buffer)
    return specs.replace(buffer=buf_specs)


class DistributedDQN:
    """Builds a shard_map'd episode step over ``mesh``.

    ``config.num_envs`` is the GLOBAL env count; it must divide evenly by
    the mesh's data-axis size.
    """

    def __init__(self, config: DQNConfig, mesh: Mesh):
        self.mesh = mesh
        ndev = mesh.shape['data']
        if config.num_envs % ndev != 0:
            raise ValueError(
                f'num_envs={config.num_envs} not divisible by '
                f'data-axis size {ndev}')
        self.config = config
        self.ndev = ndev
        local = dataclasses.replace(config,
                                    num_envs=config.num_envs // ndev)
        self.trainer = DQNTrainer(local, axis_name='data')

        def episode_local(ts: TrainState):
            # local view: per-device replay scalars arrive as (1,) slices
            buf = ts.buffer
            ts = ts.replace(buffer=buf.replace(ptr=buf.ptr[0],
                                               size=buf.size[0]))
            ts, metrics = self.trainer._episode_impl(ts)
            buf = ts.buffer
            ts = ts.replace(buffer=buf.replace(ptr=buf.ptr[None],
                                               size=buf.size[None]))
            return ts, metrics

        # abstract local TrainState: specs only need the tree structure,
        # which is identical between the local and global layouts
        template = jax.eval_shape(self.trainer.init_state,
                                  jax.random.key(0))
        specs = _state_specs(template)
        self._episode = jax.jit(jax.shard_map(
            episode_local, mesh=mesh,
            in_specs=(specs,),
            out_specs=(specs, P()),
        ))

    # ------------------------------------------------------------------
    def init_state(self, key=None) -> TrainState:
        """Global sharded TrainState laid out on the mesh."""
        cfg = self.config
        if key is None:
            key = jax.random.key(cfg.seed)
        local = self.trainer.init_state(key)
        # globalize replay: leading dim cap -> ndev * cap, scalars -> (ndev,)
        buf = local.buffer
        cap = buf.capacity

        def rep(x):
            return jnp.broadcast_to(x[None], (self.ndev,) + x.shape) \
                .reshape((self.ndev * cap,) + x.shape[1:])

        gbuf = replay.ReplayBuffer(
            obs=rep(buf.obs), action=rep(buf.action),
            reward=rep(buf.reward), next_obs=rep(buf.next_obs),
            done=rep(buf.done),
            ptr=jnp.zeros((self.ndev,), jnp.int32),
            size=jnp.zeros((self.ndev,), jnp.int32),
            obs_shape=buf.obs_shape)
        ts = local.replace(buffer=gbuf)
        # lay out on the mesh (multi-process safe: every process built the
        # same global values above)
        from marlsnake_tpu.parallel.mesh import global_put_tree
        specs = _state_specs(ts)
        shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))
        return global_put_tree(ts, shardings)

    # ------------------------------------------------------------------
    def train_episode(self, ts: TrainState) -> Tuple[TrainState, object]:
        return self._episode(ts)
