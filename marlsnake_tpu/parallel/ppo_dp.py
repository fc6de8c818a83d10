"""Data-parallel distributed PPO over a device mesh.

Same layout as ``dqn_dp``: env states, rollouts, and GAE live sharded over
the ``data`` axis; actor-critic params + optimizer state replicated;
minibatch gradients ``pmean``-reduced — equivalent to one large-batch PPO
update over the global rollout.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from marlsnake_tpu.algo.ppo_trainer import (PPOConfig, PPOTrainer,
                                            PPOTrainState)

_REPLICATED_FIELDS = ('params', 'opt_state', 'key', 'update', 'episodes',
                      'finished_return_sum', 'finished_count')


def _state_specs(ts: PPOTrainState) -> PPOTrainState:
    specs = jax.tree.map(lambda _: P('data'), ts)
    return specs.replace(**{
        f: jax.tree.map(lambda _: P(), getattr(ts, f))
        for f in _REPLICATED_FIELDS})


class DistributedPPO:
    def __init__(self, config: PPOConfig, mesh: Mesh):
        self.mesh = mesh
        ndev = mesh.shape['data']
        if config.num_envs % ndev != 0:
            raise ValueError(f'num_envs={config.num_envs} not divisible '
                             f'by data-axis size {ndev}')
        self.config = config
        self.ndev = ndev
        local = dataclasses.replace(config,
                                    num_envs=config.num_envs // ndev)
        self.trainer = PPOTrainer(local, axis_name='data')
        self._global_trainer = PPOTrainer(config)

        template = jax.eval_shape(self._global_trainer.init_state,
                                  jax.random.key(0))
        specs = _state_specs(template)
        self._update = jax.jit(jax.shard_map(
            self.trainer._update_impl, mesh=mesh,
            in_specs=(specs,), out_specs=(specs, P())))

    def init_state(self, key=None) -> PPOTrainState:
        ts = self._global_trainer.init_state(key)
        from marlsnake_tpu.parallel.mesh import global_put_tree
        specs = _state_specs(ts)
        shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P))
        return global_put_tree(ts, shardings)

    def train_update(self, ts: PPOTrainState) -> Tuple[PPOTrainState,
                                                       object]:
        return self._update(ts)
