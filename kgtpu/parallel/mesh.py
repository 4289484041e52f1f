"""Mesh construction + canonical shardings."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis: str = "data") -> Mesh:
    """1-D device mesh over the first `num_devices` devices (0 = all)."""
    devs = jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 (the batch) across the data axis."""
    return NamedSharding(mesh, P(axis))


def stacked_batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """For [steps, batch, ...] stacks (multi-step dispatch): steps axis
    replicated, batch axis sharded across the data axis."""
    return NamedSharding(mesh, P(None, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device-put a host batch with axis-0 sharding (one transfer per chip)."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
