"""Torch <-> flax checkpoint interop for the reference model family.

Lets users load reference DQN checkpoints
(``checkpoints/shared_model_*.pth`` produced by train_dqn.py:356-364) into
the flax :class:`~marlsnake_tpu.models.dqn.DQN`, accounting for layout
differences:

* torch Conv2d weight (O, I, kH, kW)  -> flax Conv kernel (kH, kW, I, O)
* torch Linear weight (out, in)       -> flax Dense kernel (in, out)
* fc1's input ordering: torch flattens NCHW activations (c, h, w) while the
  NHWC trunk flattens (h, w, c) — the fc1 kernel's input axis is permuted
  accordingly so both networks compute identical functions.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dense(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def dqn_params_from_torch(state_dict: Dict, grid_hw, in_channels: int,
                          num_actions: int = 3):
    """Convert a reference DQN torch state_dict to flax DQN params.

    ``grid_hw``: (H, W) of the observation the checkpoint was trained on
    (needed to un-permute the fc1 flatten order).
    """
    sd = {k.replace('module.', ''): np.asarray(v.detach().cpu().numpy()
                                               if hasattr(v, 'detach') else v)
          for k, v in state_dict.items()}
    h, w = grid_hw
    c_out = 64  # conv3 output channels (train_dqn.py:111)

    fc1_w = _dense(sd['fc1.weight'])  # (h*w*c? -> 256) in torch chw order
    # torch input index: c*h*w + y*w + x ; flax index: y*w*c + x*c + c_
    idx = np.arange(c_out * h * w)
    c_i, y_i, x_i = (idx // (h * w), (idx % (h * w)) // w, idx % w)
    flax_order = y_i * (w * c_out) + x_i * c_out + c_i
    fc1_perm = np.zeros_like(fc1_w)
    fc1_perm[flax_order] = fc1_w

    params = {
        'conv1': {'kernel': _conv(sd['conv1.weight']),
                  'bias': sd['conv1.bias']},
        'conv2': {'kernel': _conv(sd['conv2.weight']),
                  'bias': sd['conv2.bias']},
        'conv3': {'kernel': _conv(sd['conv3.weight']),
                  'bias': sd['conv3.bias']},
        'fc1': {'kernel': fc1_perm, 'bias': sd['fc1.bias']},
        'fc2': {'kernel': _dense(sd['fc2.weight']), 'bias': sd['fc2.bias']},
        'fc3': {'kernel': _dense(sd['fc3.weight']), 'bias': sd['fc3.bias']},
    }
    return {'params': params}


def ppo_params_from_torch(state_dict: Dict):
    """Convert the reference's shipped PPO checkpoint
    (``marlenv/runs/ppo/.../best_model.pt`` — ``CNN_feature.0/.3`` convs,
    ``actor.0/.2`` and ``critic.0/.2`` linears) into flax ActorCritic
    params. The conv/linear weights map exactly; the reference's pooling
    arrangement between the convs is lost with its source module
    (SURVEY.md C35), so functional equivalence of the conv trunk is
    best-effort — head weights are exact.
    """
    sd = {k.replace('module.', ''): np.asarray(
        v.detach().cpu().numpy() if hasattr(v, 'detach') else v)
        for k, v in state_dict.items()}
    params = {
        'conv1': {'kernel': _conv(sd['CNN_feature.0.weight']),
                  'bias': sd['CNN_feature.0.bias']},
        'conv2': {'kernel': _conv(sd['CNN_feature.3.weight']),
                  'bias': sd['CNN_feature.3.bias']},
        'actor_fc1': {'kernel': _dense(sd['actor.0.weight']),
                      'bias': sd['actor.0.bias']},
        'actor_fc2': {'kernel': _dense(sd['actor.2.weight']),
                      'bias': sd['actor.2.bias']},
        'critic_fc1': {'kernel': _dense(sd['critic.0.weight']),
                       'bias': sd['critic.0.bias']},
        'critic_fc2': {'kernel': _dense(sd['critic.2.weight']),
                       'bias': sd['critic.2.bias']},
    }
    return {'params': params}


def dqn_params_to_torch(params: Dict, grid_hw) -> Dict:
    """Inverse of :func:`dqn_params_from_torch` (flax -> torch layout)."""
    p = params['params'] if 'params' in params else params
    h, w = grid_hw
    c_out = 64
    fc1_w = np.asarray(p['fc1']['kernel'])
    idx = np.arange(c_out * h * w)
    c_i, y_i, x_i = (idx // (h * w), (idx % (h * w)) // w, idx % w)
    flax_order = y_i * (w * c_out) + x_i * c_out + c_i
    fc1_torch = fc1_w[flax_order]

    def conv_t(k):
        return np.transpose(np.asarray(k), (3, 2, 0, 1))

    out = {}
    for name in ('conv1', 'conv2', 'conv3'):
        out[f'{name}.weight'] = conv_t(p[name]['kernel'])
        out[f'{name}.bias'] = np.asarray(p[name]['bias'])
    out['fc1.weight'] = fc1_torch.T
    out['fc1.bias'] = np.asarray(p['fc1']['bias'])
    for name in ('fc2', 'fc3'):
        out[f'{name}.weight'] = np.asarray(p[name]['kernel']).T
        out[f'{name}.bias'] = np.asarray(p[name]['bias'])
    return out
