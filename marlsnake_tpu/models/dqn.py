"""DQN network — exact topology of the reference shared model.

Reference: ``train_dqn.py:104-151`` — Conv(C->32->64->64, 3x3, stride 1,
pad 1) -> FC(H*W*64 -> 256 -> 128 -> num_actions), ReLU throughout, with a
``forward_features`` variant exposing the 128-d penultimate embedding (used
by the NEAT hybrid, ``train_ga.py:94-111``).

TPU-native differences: activations stay NHWC end-to-end (the reference
permutes to NCHW for torch conv, ``train_dqn.py:122``; NHWC is the
TPU-preferred layout so no permute exists here), and an optional
``compute_dtype=bfloat16`` runs convs/matmuls on the MXU in bf16 with f32
params. The conditional /255 normalization (``train_dqn.py:123``) is kept
bit-compatible: it only divides when the batch max exceeds 1.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class DQN(nn.Module):
    num_actions: int = 3
    compute_dtype: Any = jnp.float32
    # The engine's observations are one-hot channel planes with values in
    # {0, 1} (engine.encode_frame), so the reference's conditional /255
    # (train_dqn.py:123) reduces to a plain cast: with max <= 1 the
    # division branch never fires. Setting this skips the full-batch
    # x.max() reduction (a whole-obs HBM pass feeding a scalar select)
    # while producing bit-identical activations FOR SUCH INPUTS. Leave
    # False for arbitrary (e.g. 0..255) inputs.
    assume_binary_obs: bool = False

    def setup(self):
        kw = dict(dtype=self.compute_dtype)
        self.conv1 = nn.Conv(32, (3, 3), strides=1, padding=1, **kw)
        self.conv2 = nn.Conv(64, (3, 3), strides=1, padding=1, **kw)
        self.conv3 = nn.Conv(64, (3, 3), strides=1, padding=1, **kw)
        self.fc1 = nn.Dense(256, **kw)
        self.fc2 = nn.Dense(128, **kw)
        self.fc3 = nn.Dense(self.num_actions, **kw)

    @staticmethod
    def _normalize(x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        # reference: x / 255 if x.max() > 1.0 else x (train_dqn.py:123)
        return jnp.where(x.max() > 1.0, x / 255.0, x)

    def _trunk(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 3:
            x = x[None]
        if self.assume_binary_obs:
            x = x.astype(self.compute_dtype)
        else:
            x = self._normalize(x).astype(self.compute_dtype)
        x = nn.relu(self.conv1(x))
        x = nn.relu(self.conv2(x))
        x = nn.relu(self.conv3(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(self.fc1(x))
        x = nn.relu(self.fc2(x))
        return x

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Q-values (B, num_actions)."""
        return self.fc3(self._trunk(x)).astype(jnp.float32)

    def features(self, x: jnp.ndarray) -> jnp.ndarray:
        """128-d penultimate embedding (reference ``forward_features``)."""
        return self._trunk(x).astype(jnp.float32)


class DistilledDQN(nn.Module):
    """Small acting trunk distilled from the reference-topology DQN.

    The flagship acting row is MXU-roofline-bound by the reference
    trunk's 62 MFLOP/agent (NEXT_STEPS.md round-3 analysis); this
    2-conv/16-ch student is ~8.6x fewer FLOPs. It exists ONLY as an
    opt-in acting-throughput trade (tools/distill_acting.py trains it
    DAgger-style against a frozen teacher and records argmax agreement;
    bench_table adds its row when the artifact exists) — checkpoint
    topology and training semantics stay on the reference DQN.
    """
    num_actions: int = 3
    conv_channels: tuple = (16, 32)
    fc_features: tuple = (64,)
    compute_dtype: Any = jnp.bfloat16
    assume_binary_obs: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 3:
            x = x[None]
        if self.assume_binary_obs:
            x = x.astype(self.compute_dtype)
        else:
            x = DQN._normalize(x).astype(self.compute_dtype)
        kw = dict(dtype=self.compute_dtype)
        for ch in self.conv_channels:
            x = nn.relu(nn.Conv(ch, (3, 3), strides=1, padding=1,
                                **kw)(x))
        x = x.reshape(x.shape[0], -1)
        for f in self.fc_features:
            x = nn.relu(nn.Dense(f, **kw)(x))
        return nn.Dense(self.num_actions, **kw)(x).astype(jnp.float32)
