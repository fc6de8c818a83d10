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
    Distinct valid indices assumed EXCEPT when ``val`` is a scalar, where
    duplicates are harmless (same value); the engine's write stages are
    ordered across calls instead. Vector values must be NON-NEGATIVE and
    leave +1 headroom in ``arr.dtype`` (the reduce form below encodes
    "written" as ``val + 1``; a -1 sentinel or a dtype-max value would be
    silently dropped). All engine call sites write packed cell codes
    (<= 117 in int32), which satisfy both.

    Form: ONE reduction pass over the K (writer) axis instead of K
    unrolled ``where`` chains. The chain form forced XLA to materialize
    the (num_envs, K, L) one-hot between kernels (39MB at 4096 envs,
    K=24 reset paint — fusion.292/321 in device traces); the reduce form
    fuses the one-hot generation into the reduce loop and never touches
    HBM with it. Measured: headline 5.58M -> 6.67M env-steps/s.
    """
    length = arr.shape[0]
    onehot = idx[:, None] == jnp.arange(length)[None, :]  # (K, L)
    if valid is not None:
        onehot = onehot & valid[:, None]
    val = jnp.asarray(val, dtype=arr.dtype)
    if val.ndim == 0:
        # scalar value: duplicate indices collapse naturally
        return jnp.where(onehot.any(0), val, arr)
    # disjoint per-writer values, biased by +1 so the hit test rides the
    # same reduction (values are small non-negative cell codes; a second
    # reduce_or pass for `hit` measured ~4ms/64 steps at 4096 envs)
    acc = jnp.where(onehot, val[:, None] + 1, 0).sum(0)
    return jnp.where(acc > 0, acc - 1, arr).astype(arr.dtype)


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
