"""Device-mesh helpers.

The reference's only parallelism is process-per-env fork workers over
pipes/shared-memory (wrappers.py:126-194); the TPU-native replacement is a
``jax.sharding.Mesh`` with the env batch sharded over a ``data`` axis and
learner parameters replicated, gradients reduced over ICI (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ('data',)) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f'requested {n_devices} devices, have {len(devices)}')
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def data_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Shard the leading (batch/env) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def global_put(x, sharding: NamedSharding):
    """Lay ``x`` out with ``sharding``, working in BOTH the single-process
    case (virtual mesh / one slice: plain device_put) and the
    multi-process ``jax.distributed`` case, where device_put refuses
    non-addressable shardings. In the latter every process passes the
    SAME full global value (our init paths construct state identically
    everywhere) and each picks out its addressable shards."""
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    if jax.dtypes.issubdtype(getattr(x, 'dtype', None), jax.dtypes.prng_key):
        data = np.asarray(jax.random.key_data(x))
        impl = jax.random.key_impl(x)
        global_data = jax.make_array_from_process_local_data(
            sharding, data, global_shape=data.shape)
        return jax.random.wrap_key_data(global_data, impl=impl)
    x = np.asarray(x)
    return jax.make_array_from_process_local_data(sharding, x,
                                                  global_shape=x.shape)


def global_put_tree(tree, shardings):
    return jax.tree.map(global_put, tree, shardings)
