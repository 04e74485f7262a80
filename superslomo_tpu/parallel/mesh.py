"""Device mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """2-D (data, spatial) mesh over the available devices.

    With n_spatial=1 this degenerates to pure data parallelism; a single
    device still yields a valid 1x1 mesh, so every code path is mesh-driven.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    if n_data * n_spatial != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_spatial} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Sharding for a batch-leading array; optionally also shard one spatial
    dimension (e.g. H of (B, T, H, W, C)) over the spatial axis."""
    if spatial_dim is None:
        return NamedSharding(mesh, P(DATA_AXIS))
    spec = [None] * (spatial_dim + 1)
    spec[0] = DATA_AXIS
    spec[spatial_dim] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_spec(mesh: Mesh, tree, spatial_dim: Optional[int] = None):
    """A pytree of batch shardings shaped like ``tree``."""
    s = batch_sharding(mesh, spatial_dim)
    return jax.tree.map(lambda _: s, tree)
