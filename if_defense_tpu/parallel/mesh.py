"""Mesh construction and batch sharding utilities."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "dp"


def data_parallel_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over available (or the first n) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def best_data_mesh(batch_size: int) -> Mesh:
    """Data-parallel mesh over the most devices that divide `batch_size`."""
    n = len(jax.devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    return data_parallel_mesh(n)


def get_mesh(shape: dict[str, int] | None = None) -> Mesh:
    """General mesh: `{"dp": 4, "mp": 2}`-style axis sizes (row-major)."""
    if not shape:
        return data_parallel_mesh()
    devices = np.asarray(jax.devices())
    sizes = tuple(shape.values())
    total = int(np.prod(sizes))
    if total > devices.size:
        raise ValueError(
            f"mesh {shape} needs {total} devices, have {devices.size}"
        )
    return Mesh(devices[:total].reshape(sizes), tuple(shape.keys()))


def shard_batch(batch, mesh: Mesh, axis: str = BATCH_AXIS):
    """Device-put a pytree with its leading axis sharded over `axis`.

    Leading dims must divide the mesh axis size; pad with
    `data.batch_iterator(pad_last=True)` upstream.
    """
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (e.g. model params) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
