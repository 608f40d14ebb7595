"""Device mesh and sharding helpers.

The reference is single-device (train_thermal_dustr.py:60: `"cuda" if
available`). Here parallelism is first-class: a 1-D data mesh by default, with
named axes so tensor axes can be added later without touching call sites.
Collectives (grad all-reduce) are inserted by XLA from the shardings and ride
ICI within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over all (or given) devices.

    A single -1 in mesh_shape absorbs the remaining device count, mirroring
    numpy reshape semantics.
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard the batch axis over the 'data' mesh axis, replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays onto the mesh, batch-sharded on axis 0."""
    def _put(x):
        x = np.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(_put, batch)


def shard_batch_multihost(mesh: Mesh, batch):
    """Multi-host variant: each process supplies its LOCAL shard of the global
    batch; jax assembles the logically-global arrays across hosts over DCN
    (SURVEY.md §2.3 — jax.make_array_from_process_local_data). On a single
    host this is equivalent to shard_batch."""
    def _put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            data_sharding(mesh, x.ndim), x)

    return jax.tree_util.tree_map(_put, batch)


def local_batch_size(mesh: Mesh, global_batch_size: int) -> int:
    n = mesh.shape.get("data", 1)
    if global_batch_size % n:
        raise ValueError(
            f"global batch size {global_batch_size} not divisible by data-parallel size {n}"
        )
    return global_batch_size // n
