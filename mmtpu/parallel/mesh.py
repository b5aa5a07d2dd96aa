"""Device-mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("config",),
    devices=None,
) -> Mesh:
    """1-D (or reshaped) mesh over the available devices.

    Default: all local devices on one "config" axis — the sweep axis rides
    ICI with zero inner-loop communication.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.array(devices)
    # all devices on the first axis; any extra axes are singleton
    shape = [len(devices)] + [1] * (len(axis_names) - 1)
    return Mesh(arr.reshape(shape), axis_names)


def config_sharding(mesh: Mesh, axis: str = "config") -> NamedSharding:
    """Shard the leading (config) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated across the mesh (shared data tensors)."""
    return NamedSharding(mesh, P())
