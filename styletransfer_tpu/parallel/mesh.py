"""Device mesh construction and sharding policies.

The reference is strictly single-device (one global ``DEVICE`` chosen at
import, constants.py:20-25; no collectives anywhere — SURVEY.md §2.2). The
TPU-native scaling strategy is **data parallelism over a 1-D mesh**: batches
sharded over the ``data`` axis, parameters replicated, gradients reduced by
XLA-inserted collectives (psum over ICI) when a jitted step's ``out_shardings``
demand replicated updated params.

At these model sizes (ImageTransformNet ≈ 1.7 M params) parameter sharding
(TP/PP) buys nothing — SURVEY.md §2.2 rules it out — so the mesh is 1-D and
everything follows from `jax.sharding.NamedSharding` annotations + jit.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """Build a 1-D data-parallel mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def auto_mesh(batch_size: int, axis_name: str = DATA_AXIS) -> Mesh:
    """Mesh over the most devices that evenly divide ``batch_size``.

    Static shapes require the batch to split exactly across the data axis;
    with e.g. batch 4 on 8 devices this yields a 4-device mesh.
    """
    devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def frames_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 1 (batch) of a [T, B, ...] frame-chunk over the data axis."""
    return NamedSharding(mesh, P(None, axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (for params / optimizer state / scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Device-put a host batch, sharded across the mesh's data axis.

    ``jax.device_put`` with a NamedSharding is asynchronous: the transfer
    overlaps with whatever the device is currently executing, which is what
    makes the prefetch pipeline effective.
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def shard_frames(chunk: Any, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Device-put a [T, B, ...] frame-chunk sharded on the batch axis."""
    sharding = frames_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), chunk)


def replicate(tree: Any, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
