"""PPO actor-critic network.

The reference's ``algorithm/ppo.py`` module is ABSENT from the repo (it is
imported at ``train_dqn.py:703`` but was never committed — SURVEY.md C35).
The topology here is reconstructed from the shipped checkpoint
``marlenv/runs/ppo/20251228-155100/best_model.pt``:

* ``CNN_feature``: Conv(8->32, 3x3) ... Conv(32->32, 3x3) with pooling down
  to a 128-d feature (= 32 channels * 2 * 2 spatial).
* ``actor``: Dense(128->256->3); ``critic``: Dense(128->256->1).

We realize the 128-d bottleneck with two stride-2 pool stages plus an
adaptive average pool to 2x2, which reproduces the checkpoint's layer
shapes for any grid size.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn


class ActorCritic(nn.Module):
    num_actions: int = 3
    compute_dtype: Any = jnp.float32
    # skip the conditional-/255 whole-batch max reduce; bit-identical
    # for the engine's one-hot obs (see models/dqn.DQN.assume_binary_obs)
    assume_binary_obs: bool = False

    def setup(self):
        kw = dict(dtype=self.compute_dtype)
        self.conv1 = nn.Conv(32, (3, 3), strides=1, padding='SAME', **kw)
        self.conv2 = nn.Conv(32, (3, 3), strides=1, padding='SAME', **kw)
        self.actor_fc1 = nn.Dense(256, **kw)
        self.actor_fc2 = nn.Dense(self.num_actions, **kw)
        self.critic_fc1 = nn.Dense(256, **kw)
        self.critic_fc2 = nn.Dense(1, **kw)

    @staticmethod
    def _normalize(x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        return jnp.where(x.max() > 1.0, x / 255.0, x)

    def features(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 3:
            x = x[None]
        if self.assume_binary_obs:
            # engine obs are one-hot {0, 1}: the conditional /255 never
            # divides, so skipping its whole-batch max reduce is
            # bit-identical (same flag as models/dqn.DQN)
            x = x.astype(self.compute_dtype)
        else:
            x = self._normalize(x).astype(self.compute_dtype)
        x = nn.relu(self.conv1(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(self.conv2(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # adaptive average pool to 2x2 -> 32 * 2 * 2 = 128 features
        b, h, w, c = x.shape
        ph, pw = max(h // 2, 1), max(w // 2, 1)
        x = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
        x = x[:, :2, :2, :]
        return x.reshape(b, -1)

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (logits (B, A), value (B,))."""
        f = self.features(x)
        logits = self.actor_fc2(nn.relu(self.actor_fc1(f)))
        value = self.critic_fc2(nn.relu(self.critic_fc1(f)))
        return logits.astype(jnp.float32), value.squeeze(-1).astype(
            jnp.float32)
