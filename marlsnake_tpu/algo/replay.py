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
    # obs/next_obs are stored FLAT (cap, prod(obs_shape)): with the
    # natural (cap, H, W, C) shape XLA assigns the buffer different
    # layouts at the episode-scan boundary vs the conv consumer and
    # inserts two strided layout-transpose copies of the ENTIRE buffer
    # per episode (205ms/episode at capacity 10000 in device traces);
    # a 2D buffer has one canonical layout and the reshape after the
    # 512-row sample gather is negligible.
    obs: jnp.ndarray        # (cap, prod(obs_shape)) uint8
    action: jnp.ndarray     # (cap,) int32
    reward: jnp.ndarray     # (cap,) float32
    next_obs: jnp.ndarray   # (cap, prod(obs_shape)) uint8
    done: jnp.ndarray       # (cap,) bool
    ptr: jnp.ndarray        # () int32
    size: jnp.ndarray       # () int32
    obs_shape: Tuple[int, ...] = struct.field(pytree_node=False,
                                              default=())

    @property
    def capacity(self) -> int:
        return self.obs.shape[0]


def create(capacity: int, obs_shape: Tuple[int, ...]) -> ReplayBuffer:
    import math
    flat = math.prod(obs_shape)
    return ReplayBuffer(
        obs=jnp.zeros((capacity, flat), jnp.uint8),
        action=jnp.zeros((capacity,), jnp.int32),
        reward=jnp.zeros((capacity,), jnp.float32),
        next_obs=jnp.zeros((capacity, flat), jnp.uint8),
        done=jnp.zeros((capacity,), bool),
        ptr=jnp.int32(0),
        size=jnp.int32(0),
        obs_shape=tuple(obs_shape),
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
        obs=buf.obs.at[slots].set(
            obs.astype(jnp.uint8).reshape(n, -1), mode='drop'),
        action=buf.action.at[slots].set(action.astype(jnp.int32),
                                        mode='drop'),
        reward=buf.reward.at[slots].set(reward.astype(jnp.float32),
                                        mode='drop'),
        next_obs=buf.next_obs.at[slots].set(
            next_obs.astype(jnp.uint8).reshape(n, -1), mode='drop'),
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
    bshape = (batch_size,) + buf.obs_shape
    return (buf.obs[idx].reshape(bshape), buf.action[idx],
            buf.reward[idx], buf.next_obs[idx].reshape(bshape),
            buf.done[idx])
