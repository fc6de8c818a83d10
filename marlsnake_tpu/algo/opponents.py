"""Opponent zoo for evaluation battles.

Counterparts of the reference's external agents (train_dqn.py:678-856):
``RandomAgent`` (ExternalAgentBase), ``GreedyAgent`` (masked Manhattan
fruit-seeker), ``PPOAgent`` (actor-critic policy), ``NEATAgent``
(frozen-DQN features -> evolved NEAT net).
"""

from __future__ import annotations

import random
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from marlsnake_tpu.core import types as T

DEADLY_CHANNELS = [T.CH_WALL, T.CH_OTHER_HEAD, T.CH_OTHER_BODY,
                   T.CH_OTHER_TAIL, T.CH_MY_BODY, T.CH_MY_TAIL]


class AgentBase:
    def __init__(self, agent_id: int):
        self.agent_id = agent_id
        self.name = f'Agent_{agent_id}'

    def reset(self):
        pass

    def get_action(self, obs: np.ndarray) -> int:
        raise NotImplementedError


class RandomAgent(AgentBase):
    """Uniform random over {0, 1, 2} (train_dqn.py:678-694)."""

    def get_action(self, obs):
        return random.choice([0, 1, 2])


class GreedyAgent(AgentBase):
    """Masked Manhattan fruit-seeker (train_dqn.py:774-856)."""

    def __init__(self, agent_id: int):
        super().__init__(agent_id)
        self.name = f'Greedy_FruitSeeker_{agent_id}'
        self.current_direction: Optional[tuple] = None

    def reset(self):
        self.current_direction = None

    def get_action(self, obs):
        obs = np.asarray(obs)
        head = np.argwhere(obs[:, :, T.CH_MY_HEAD] == 1)
        if len(head) == 0:
            return 0
        hy, hx = head[0]

        fruits = np.argwhere(obs[:, :, T.CH_FRUIT] == 1)
        target = None
        if len(fruits) > 0:
            dists = [abs(hy - fy) + abs(hx - fx) for fy, fx in fruits]
            target = fruits[int(np.argmin(dists))]

        if self.current_direction is None:
            cur = (-1, 0)
            for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
                by, bx = hy + dy, hx + dx
                if (0 <= by < obs.shape[0] and 0 <= bx < obs.shape[1]
                        and (obs[by, bx, T.CH_MY_BODY] == 1
                             or obs[by, bx, T.CH_MY_TAIL] == 1)):
                    cur = (hy - by, hx - bx)
                    break
            self.current_direction = cur

        dy, dx = self.current_direction
        moves = {0: (dy, dx), 1: (-dx, dy), 2: (dx, -dy)}
        scores = []
        for a in (0, 1, 2):
            mdy, mdx = moves[a]
            ny, nx = hy + mdy, hx + mdx
            if not (0 <= ny < obs.shape[0] and 0 <= nx < obs.shape[1]):
                scores.append(-float('inf'))
                continue
            if any(obs[ny, nx, ch] == 1 for ch in DEADLY_CHANNELS):
                scores.append(-float('inf'))
                continue
            score = 0.0
            if target is not None:
                score = -(abs(ny - target[0]) + abs(nx - target[1]))
            scores.append(score)

        if all(s == -float('inf') for s in scores):
            chosen = 0
        else:
            best = max(scores)
            chosen = random.choice(
                [i for i, s in enumerate(scores) if s == best])
        self.current_direction = moves[chosen]
        return chosen


class PPOAgent(AgentBase):
    """Greedy actor policy from a PPO ActorCritic checkpoint."""

    def __init__(self, agent_id: int, params, net=None):
        super().__init__(agent_id)
        self.name = f'PPO_Agent_{agent_id}'
        if net is None:
            from marlsnake_tpu.models.ppo import ActorCritic
            net = ActorCritic(num_actions=3)
        self.net = net
        self.params = params
        self._fwd = jax.jit(lambda p, x: net.apply(p, x)[0])

    def get_action(self, obs):
        logits = self._fwd(self.params, jnp.asarray(obs)[None])
        return int(jnp.argmax(logits[0]))


class DQNAgent(AgentBase):
    """Greedy (unmasked) DQN policy."""

    def __init__(self, agent_id: int, params, net=None):
        super().__init__(agent_id)
        self.name = f'DQN_Agent_{agent_id}'
        if net is None:
            from marlsnake_tpu.models.dqn import DQN
            net = DQN(num_actions=3)
        self.net = net
        self.params = params
        self._fwd = jax.jit(lambda p, x: net.apply(p, x))

    def get_action(self, obs):
        q = self._fwd(self.params, jnp.asarray(obs)[None])
        return int(jnp.argmax(q[0]))


class NEATAgent(AgentBase):
    """Frozen-DQN features -> NEAT decision head
    (HybridNEATEnemy, train_dqn.py:725-772)."""

    def __init__(self, agent_id: int, dqn_params, genome, neat_config,
                 net=None):
        super().__init__(agent_id)
        self.name = f'Hybrid_NEAT_{agent_id}'
        if net is None:
            from marlsnake_tpu.models.dqn import DQN
            net = DQN(num_actions=3)
        from marlsnake_tpu.algo.neat import FeedForwardNetwork
        self.net = net
        self.dqn_params = dqn_params
        self.neat_net = FeedForwardNetwork.create(genome, neat_config)
        self._embed = jax.jit(
            lambda p, x: net.apply(p, x, method=net.features))

    def get_action(self, obs):
        feats = np.asarray(
            self._embed(self.dqn_params, jnp.asarray(obs)[None]))[0]
        out = self.neat_net.activate(feats)
        return int(np.argmax(out))
