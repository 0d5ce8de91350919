"""Device-mesh construction and sharding helpers.

The reference is single-GPU (SURVEY.md §2.2); this layer is the TPU-native
scaling story designed in from day one: a (data,) or (data, model) mesh
over which training is data-parallel (batch axis sharded, params
replicated) and sliding-window inference shards the patch grid.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Tuple[str, ...] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a Mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is None or n_devices < 0:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = [n_devices] + [1] * (len(axes) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host array batch with the leading axis sharded over 'data'."""
    return jax.device_put(batch, data_sharding(mesh))
