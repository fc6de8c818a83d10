"""Model tests: shapes, torch checkpoint interop equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlsnake_tpu.models.dqn import DQN
from marlsnake_tpu.models.ppo import ActorCritic


def test_dqn_shapes_and_features():
    net = DQN(num_actions=3)
    x = jnp.zeros((5, 20, 20, 8), jnp.uint8)
    params = net.init(jax.random.key(0), x)
    q = net.apply(params, x)
    assert q.shape == (5, 3)
    f = net.apply(params, x, method=net.features)
    assert f.shape == (5, 128)


def test_dqn_normalize_conditional():
    net = DQN(num_actions=3)
    x01 = jnp.ones((2, 8, 8, 8), jnp.uint8)
    params = net.init(jax.random.key(0), x01)
    # 0/1 obs must NOT be divided by 255: outputs for x==1 and x==255
    # (which IS divided) must agree (train_dqn.py:123 semantics)
    q1 = net.apply(params, x01)
    q255 = net.apply(params, (x01 * 255))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q255),
                               rtol=2e-5, atol=1e-5)


def test_actor_critic_shapes():
    net = ActorCritic(num_actions=3)
    x = jnp.zeros((7, 20, 20, 8), jnp.uint8)
    params = net.init(jax.random.key(0), x)
    logits, value = net.apply(params, x)
    assert logits.shape == (7, 3)
    assert value.shape == (7,)
    # feature bottleneck must be 128-d to match the shipped PPO checkpoint
    f = net.apply(params, x, method=net.features)
    assert f.shape == (7, 128)


def test_torch_interop_equivalence():
    torch = pytest.importorskip('torch')
    import torch.nn as nn
    import torch.nn.functional as F
    from marlsnake_tpu.models.torch_interop import dqn_params_from_torch

    h, w, c = 10, 10, 8

    class TorchDQN(nn.Module):
        """Same topology as the reference DQN (train_dqn.py:104-134)."""

        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(c, 32, 3, 1, 1)
            self.conv2 = nn.Conv2d(32, 64, 3, 1, 1)
            self.conv3 = nn.Conv2d(64, 64, 3, 1, 1)
            self.fc1 = nn.Linear(h * w * 64, 256)
            self.fc2 = nn.Linear(256, 128)
            self.fc3 = nn.Linear(128, 3)

        def forward(self, x):
            x = x.permute(0, 3, 1, 2).float()
            x = F.relu(self.conv1(x))
            x = F.relu(self.conv2(x))
            x = F.relu(self.conv3(x))
            x = x.reshape(x.size(0), -1)
            x = F.relu(self.fc1(x))
            x = F.relu(self.fc2(x))
            return self.fc3(x)

    tmodel = TorchDQN().eval()
    obs = np.random.default_rng(0).integers(
        0, 2, size=(4, h, w, c)).astype(np.uint8)
    with torch.no_grad():
        want = tmodel(torch.tensor(obs)).numpy()

    params = dqn_params_from_torch(tmodel.state_dict(), (h, w), c)
    net = DQN(num_actions=3)
    got = np.asarray(net.apply(
        jax.tree.map(jnp.asarray, params), jnp.asarray(obs)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ppo_interop_loads_reference_checkpoint():
    torch = pytest.importorskip('torch')
    import os
    ckpt_path = ('/root/reference/marlenv/runs/ppo/20251228-155100/'
                 'best_model.pt')
    if not os.path.exists(ckpt_path):
        pytest.skip('reference PPO checkpoint not available')
    from marlsnake_tpu.models.torch_interop import ppo_params_from_torch
    ckpt = torch.load(ckpt_path, map_location='cpu', weights_only=False)
    params = jax.tree.map(jnp.asarray,
                          ppo_params_from_torch(ckpt['model_state_dict']))
    net = ActorCritic(num_actions=3)
    obs = jnp.zeros((2, 20, 20, 8), jnp.uint8)
    logits, value = net.apply(params, obs)
    assert logits.shape == (2, 3) and value.shape == (2,)
    assert np.isfinite(np.asarray(logits)).all()
