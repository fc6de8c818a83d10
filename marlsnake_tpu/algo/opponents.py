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

    @staticmethod
    def _infer_direction(obs, hy, hx):
        """Direction of travel = away from the adjacent own-body cell
        (probed UP/DOWN/LEFT/RIGHT, first hit wins); UP if none."""
        h, w = obs.shape[:2]
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            by, bx = hy + dy, hx + dx
            if (0 <= by < h and 0 <= bx < w
                    and (obs[by, bx, T.CH_MY_BODY] == 1
                         or obs[by, bx, T.CH_MY_TAIL] == 1)):
                return (-dy, -dx)
        return (-1, 0)

    def get_action(self, obs):
        obs = np.asarray(obs)
        h, w = obs.shape[:2]
        head = np.argwhere(obs[:, :, T.CH_MY_HEAD] == 1)
        if len(head) == 0:
            return 0
        hy, hx = head[0]

        if self.current_direction is None:
            self.current_direction = self._infer_direction(obs, hy, hx)
        dy, dx = self.current_direction

        # the 3 relative moves scored as one (3,) vector op:
        # row a of `moves` = {0: forward, 1: left, 2: right}
        moves = np.array([(dy, dx), (-dx, dy), (dx, -dy)])
        ny, nx = hy + moves[:, 0], hx + moves[:, 1]
        inb = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
        deadly = obs[np.clip(ny, 0, h - 1), np.clip(nx, 0, w - 1)
                     ][:, DEADLY_CHANNELS].any(axis=-1)
        legal = inb & ~deadly

        fruits = np.argwhere(obs[:, :, T.CH_FRUIT] == 1)
        if len(fruits) > 0:
            ty, tx = fruits[np.abs(fruits - (hy, hx)).sum(axis=1).argmin()]
            scores = -(np.abs(ny - ty) + np.abs(nx - tx)).astype(float)
        else:
            scores = np.zeros(3)
        scores = np.where(legal, scores, -np.inf)

        if not legal.any():
            chosen = 0
        else:
            chosen = random.choice(
                np.flatnonzero(scores == scores.max()).tolist())
        self.current_direction = tuple(moves[chosen])
        return chosen


class PPOAgent(AgentBase):
    """Greedy actor policy from a PPO ActorCritic checkpoint."""

    def __init__(self, agent_id: int, params, net=None):
        super().__init__(agent_id)
        self.name = f'PPO_Agent_{agent_id}'
        if net is None:
            from marlsnake_tpu.models.ppo import ActorCritic
            # engine obs are one-hot: normalize skip is bit-identical
            net = ActorCritic(num_actions=3, assume_binary_obs=True)
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
            net = DQN(num_actions=3, assume_binary_obs=True)
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
            net = DQN(num_actions=3, assume_binary_obs=True)
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
