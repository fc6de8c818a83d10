"""Device-resident uniform replay buffer.

Replaces the reference's host-side ``deque`` of namedtuples
(``train_dqn.py:86-100``) with a fixed-capacity ring of device arrays:
pushes are scatter writes, sampling is a gather — both stay inside jitted
programs, so transitions never round-trip to the host. Observations are
stored as uint8 (the env's native obs dtype); the network normalizes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    obs: jnp.ndarray        # (cap, *obs_shape) uint8
    action: jnp.ndarray     # (cap,) int32
    reward: jnp.ndarray     # (cap,) float32
    next_obs: jnp.ndarray   # (cap, *obs_shape) uint8
    done: jnp.ndarray       # (cap,) bool
    ptr: jnp.ndarray        # () int32
    size: jnp.ndarray       # () int32

    @property
    def capacity(self) -> int:
        return self.obs.shape[0]


def create(capacity: int, obs_shape: Tuple[int, ...]) -> ReplayBuffer:
    return ReplayBuffer(
        obs=jnp.zeros((capacity,) + tuple(obs_shape), jnp.uint8),
        action=jnp.zeros((capacity,), jnp.int32),
        reward=jnp.zeros((capacity,), jnp.float32),
        next_obs=jnp.zeros((capacity,) + tuple(obs_shape), jnp.uint8),
        done=jnp.zeros((capacity,), bool),
        ptr=jnp.int32(0),
        size=jnp.int32(0),
    )


def push(buf: ReplayBuffer, obs, action, reward, next_obs, done,
         mask=None) -> ReplayBuffer:
    """Push a batch of transitions; ``mask`` selects which rows count.

    Masked-out rows are written to a dropped slot so the shapes stay static
    (the reference conditionally skips pushes for already-done agents,
    train_dqn.py:290-297).
    """
    n = obs.shape[0]
    cap = buf.capacity
    if mask is None:
        mask = jnp.ones((n,), bool)
    # rank of each active row among active rows -> contiguous slots
    offs = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slots = jnp.where(mask, (buf.ptr + offs) % cap, cap)  # cap -> dropped
    num = mask.sum().astype(jnp.int32)

    return buf.replace(
        obs=buf.obs.at[slots].set(obs.astype(jnp.uint8), mode='drop'),
        action=buf.action.at[slots].set(action.astype(jnp.int32),
                                        mode='drop'),
        reward=buf.reward.at[slots].set(reward.astype(jnp.float32),
                                        mode='drop'),
        next_obs=buf.next_obs.at[slots].set(next_obs.astype(jnp.uint8),
                                            mode='drop'),
        done=buf.done.at[slots].set(done.astype(bool), mode='drop'),
        ptr=(buf.ptr + num) % cap,
        size=jnp.minimum(buf.size + num, cap),
    )


def sample(buf: ReplayBuffer, key, batch_size: int,
           replace: bool = False):
    """Uniform sample of ``batch_size`` transitions.

    ``replace=False`` (default) matches the reference's ``random.sample``
    semantics (train_dqn.py:96-97): distinct indices, implemented as a
    top-k over random keys restricted to the filled region — O(capacity)
    on-device, no host round trip. ``replace=True`` is the cheaper
    independent-draws variant.
    """
    if replace or batch_size > buf.capacity:
        idx = jax.random.randint(key, (batch_size,), 0,
                                 jnp.maximum(buf.size, 1))
    else:
        cap = buf.capacity
        u = jax.random.uniform(key, (cap,))
        # unfilled slots get keys > 1 so they sort last; if size <
        # batch_size the tail indices wrap via mod (duplicates only then)
        u = u + (jnp.arange(cap) >= buf.size) * 2.0
        idx = jnp.argsort(u)[:batch_size]
        idx = idx % jnp.maximum(buf.size, 1)
    return (buf.obs[idx], buf.action[idx], buf.reward[idx],
            buf.next_obs[idx], buf.done[idx])
