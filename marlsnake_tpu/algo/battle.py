"""Battle arena: masked-DQN vs an opponent lineup.

Counterpart of the reference ``BattleArena`` (train_dqn.py:858-960):
agent 0 plays with the full safety-masked evaluator policy; agents 1..N-1
are external agents from the opponent zoo. Prints the same per-algorithm
mean reward / mean lifetime table.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from marlsnake_tpu.algo.evaluator import masked_actions
from marlsnake_tpu.algo.opponents import AgentBase


class BattleArena:
    def __init__(self, env, net, params,
                 external_agents: Sequence[AgentBase],
                 display_names: Optional[List[str]] = None,
                 flood_limit: int = 60):
        self.env = env
        n = env.num_snakes
        assert len(external_agents) == n - 1, (
            f'need {n - 1} external agents for 1-vs-{n - 1}')
        self.external_agents = list(external_agents)
        self.display_names = display_names or (
            ['DQN (Main)'] + [a.name for a in self.external_agents])
        self.net = net
        self.params = params

        @jax.jit
        def dqn_policy(params, obs, cur_dirs, active):
            q = net.apply(params, obs)
            return masked_actions(obs, q, cur_dirs, active, flood_limit)

        self._dqn_policy = dqn_policy

    def run_battle(self, num_episodes: int = 10, render: bool = False,
                   max_steps: int = 512, verbose: bool = True):
        n = self.env.num_snakes
        total_rewards = np.zeros(n)
        total_lifetimes = np.zeros(n)

        for ep in range(num_episodes):
            obs = self.env.reset()
            for a in self.external_agents:
                a.reset()
            dones = [False] * n
            dirs = jnp.zeros((n, 2), jnp.int32)
            ep_rewards = np.zeros(n)
            ep_lifetimes = np.zeros(n)
            steps = 0
            while not all(dones) and steps < max_steps:
                if render:
                    self.env.render()
                actions = [0] * n
                if not dones[0]:
                    ep_lifetimes[0] += 1
                    active = jnp.asarray(
                        [not dones[0]] + [False] * (n - 1))
                    acts, dirs = self._dqn_policy(
                        self.params, jnp.asarray(obs), dirs, active)
                    actions[0] = int(np.asarray(acts)[0])
                for i in range(1, n):
                    if not dones[i]:
                        ep_lifetimes[i] += 1
                        actions[i] = int(
                            self.external_agents[i - 1].get_action(obs[i]))
                obs, rewards, dones, _ = self.env.step(actions)
                ep_rewards += np.asarray(rewards)
                steps += 1
            total_rewards += ep_rewards
            total_lifetimes += ep_lifetimes
            if verbose:
                print(f'Episode {ep + 1:2d} Done. Steps: {steps}')

        if verbose:
            print('\n' + '=' * 65)
            print(f'{"ALGORITHM":<20} | {"MEAN REWARD":<18} | '
                  f'{"MEAN LIFETIME":<15}')
            print('-' * 65)
            for i in range(n):
                print(f'{self.display_names[i]:<20} | '
                      f'{total_rewards[i] / num_episodes:>18.2f} | '
                      f'{total_lifetimes[i] / num_episodes:>15.1f}')
            print('=' * 65 + '\n')
        return (total_rewards / num_episodes,
                total_lifetimes / num_episodes)
