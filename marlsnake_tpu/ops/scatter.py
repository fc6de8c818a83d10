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
    Overlapping valid indices resolve LAST-WRITER-WINS (ascending j) —
    strictly more general than the earlier sum-reduce form, which
    required disjoint writers for vector values; every engine call site
    is disjoint, so the two forms are bit-identical there.

    Form history: K unrolled ``where`` chains fusing into ONE
    elementwise pass per consumer. Round 1 measured the chain form
    LOSING to a (K, L) one-hot sum-reduce (5.58M vs 6.67M headline) —
    XLA materialized the one-hot between kernels at the K=24 reset
    paint. Round 5 re-measured after that call site left the hot path
    (procedural reset paints closed-form; blob mode gathers): the chain
    now WINS or ties everywhere — headline 16.8M -> 17.6M (K=16
    phase-6 writes), 10x10x1 33.9M -> 42.2M (small-board reset paint),
    8-snake fs4 rows flat (K=32). Same lesson as the fruit-hit unroll:
    with a static tiny writer axis, chained scalar-broadcast selects
    beat materializing the (K, L) intermediate + reduction.
    """
    length = arr.shape[0]
    ar = jnp.arange(length)
    val = jnp.asarray(val, dtype=arr.dtype)
    out = arr
    for j in range(idx.shape[0]):
        hit = idx[j] == ar
        if valid is not None:
            hit = hit & valid[j]
        vj = val if val.ndim == 0 else val[j]
        out = jnp.where(hit, vj, out)
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
