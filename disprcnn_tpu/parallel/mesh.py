"""Device mesh + sharding helpers (TPU-native replacement of utils/comm.py).

The reference's NCCL DDP (tools/train_net.py:36-41, utils/comm.py:12-117)
becomes: a jax.sharding.Mesh over the slice, batch sharded on the 'data'
axis, parameters replicated, gradient all-reduce inserted by XLA when the
jitted step consumes sharded data with replicated params — collectives ride
ICI, no hand-rolled gathers.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[str] = ("data",),
    shape: Sequence[int] = (-1,),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    known = int(np.prod([s for s in shape if s > 0])) if any(s > 0 for s in shape) else 1
    for i, s in enumerate(shape):
        if s == -1:
            shape[i] = len(devices) // known
    arr = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, tuple(axes))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batches."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place every leaf of a batch pytree with its leading dim on `axis`."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
