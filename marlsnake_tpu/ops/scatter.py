"""Dense one-hot writes: TPU-friendly replacement for tiny scatters.

XLA lowers `array.at[idx].set(...)` with a handful of dynamic indices to a
serialized scatter loop on TPU. For the engine's per-env writes (a few
cells into a ~400-cell grid, or one lane of a ring buffer) a dense one-hot
compare + select is far faster: it is pure VPU work with no serialization,
and fuses with neighboring elementwise ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def dense_set_1d(arr: jnp.ndarray, idx: jnp.ndarray, val,
                 valid=None) -> jnp.ndarray:
    """arr[(idx[j])] = val[j] for valid j, as a dense masked select.

    arr (L,), idx (K,) int, val scalar or (K,), valid (K,) bool or None.
    Distinct valid indices assumed (writes within one call never collide;
    the engine's write stages are ordered across calls instead).
    """
    length = arr.shape[0]
    onehot = idx[:, None] == jnp.arange(length)[None, :]  # (K, L)
    if valid is not None:
        onehot = onehot & valid[:, None]
    val = jnp.asarray(val, dtype=arr.dtype)
    if val.ndim == 0:
        val = jnp.broadcast_to(val, idx.shape)
    # unrolled last-writer-wins (K is a small static constant; duplicate
    # indices — e.g. with-replacement fruit draws — stay correct)
    out = arr
    for j in range(idx.shape[0]):
        out = jnp.where(onehot[j], val[j], out)
    return out


def dense_add_1d(arr: jnp.ndarray, idx: jnp.ndarray,
                 val: jnp.ndarray) -> jnp.ndarray:
    """arr[idx[j]] += val[j] (duplicate indices accumulate), dense."""
    length = arr.shape[0]
    onehot = (idx[:, None] == jnp.arange(length)[None, :]).astype(arr.dtype)
    return arr + (onehot * val[:, None]).sum(0)


def dense_set_rows(arr: jnp.ndarray, col: jnp.ndarray, val,
                   valid=None) -> jnp.ndarray:
    """arr[i, col[i]] = val[i] (one write per row), dense.

    arr (R, L), col (R,), val scalar or (R,), valid (R,) bool or None.
    """
    length = arr.shape[1]
    onehot = col[:, None] == jnp.arange(length)[None, :]  # (R, L)
    if valid is not None:
        onehot = onehot & valid[:, None]
    val = jnp.asarray(val, dtype=arr.dtype)
    if val.ndim == 0:
        val = jnp.broadcast_to(val, col.shape)
    return jnp.where(onehot, val[:, None], arr)
