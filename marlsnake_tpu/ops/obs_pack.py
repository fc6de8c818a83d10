"""Bit-packed observation format (EnvConfig.obs_format == 'packed').

The engine's 8 one-hot feature channels (reference snake_env.py:474-519:
wall, fruit, other-head/body/tail, my-head/body/tail) are {0,1} planes —
8x larger than information-theoretic. In packed mode each frame's 8
channels collapse into ONE byte per cell (bit c = channel c), so the obs
is (N, H, W, frame_stack) uint8 instead of (N, H, W, 8*frame_stack).

Why it exists: big-board frame-stacked rows are HBM-roofline-bound on the
obs stream itself — the 30x30x8 fs4 row writes 944MB of uint8 obs per
step and its checksum consumer alone reads that back at ~500GB/s (54% of
device time, round-4 trace). Packing is an obs-FORMAT change, not an
encode micro-optimization; the default stays the reference's uint8
contract.

``unpack_obs`` reproduces the uint8 planes BIT-IDENTICALLY
(equivalence-tested in tests/test_ops.py): channel order matches
``engine.stack_to_obs`` — frame-major, oldest first, so unpacked channel
f*8 + c equals uint8-mode channel f*8 + c.
"""

from __future__ import annotations

import jax.numpy as jnp

from marlsnake_tpu.core import types as T


def pack_frame(frame: jnp.ndarray) -> jnp.ndarray:
    """(..., 8) one-hot {0,1} uint8 -> (..., 1) packed byte."""
    c = jnp.arange(T.FEATURE_CHANNEL, dtype=jnp.uint32)
    byte = (frame.astype(jnp.uint32) << c).sum(-1).astype(jnp.uint8)
    return byte[..., None]


def unpack_obs(packed: jnp.ndarray) -> jnp.ndarray:
    """(..., fs) packed bytes -> (..., fs*8) one-hot uint8 planes.

    Bit c of byte f becomes channel f*8 + c — the exact channel layout
    of the uint8-mode frame stack (engine.stack_to_obs).
    """
    bits = (packed[..., :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
    return bits.reshape(packed.shape[:-1]
                        + (packed.shape[-1] * 8,)).astype(jnp.uint8)
