"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"


def make_mesh(n_devices: int | None = None, axis: str = TILE_AXIS) -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices (default: all).
    The single axis shards the image row/tile dimension; the scene is
    replicated (BASELINE: "BVH and scene buffers replicated per host")."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = TILE_AXIS) -> NamedSharding:
    """Shard the leading (row) axis of an (H, W, ...) image."""
    return NamedSharding(mesh, P(axis))
