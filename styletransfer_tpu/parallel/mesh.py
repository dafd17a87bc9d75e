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
    if n < len(devices):
        from styletransfer_tpu.utils.logging import get_logger

        get_logger().warning(
            "auto_mesh: batch size %d does not divide the %d available "
            "devices; using a %d-device mesh (%d device(s) idle). Pick a "
            "batch size divisible by the device count to use every chip.",
            batch_size, len(devices), n, len(devices) - n,
        )
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def resolve_global_batch(batch_size: int, global_batch) -> int:
    """Resolve the training global batch from the ``--global-batch`` opt-in.

    - ``None``/empty (the default): ``batch_size`` IS the global batch —
      the reference's semantics (`clis/fast_st.py:21` batch-size=4), which
      on an 8-chip mesh idles 4 chips with only :func:`auto_mesh`'s
      warning.
    - ``"auto"``: ``batch_size`` becomes PER-CHIP; the global batch is
      ``batch_size × jax.device_count()`` — every chip busy at the same
      per-chip load, the DP-scaling default for multi-chip training.
    - an integer string: an explicit global batch.

    The learning-rate implication is deliberate and logged: Adam stays at
    the reference default (1e-3) whatever the global batch, preserving
    trajectory semantics at the reference's batch. Scaling the global
    batch K× reduces gradient noise ~K×; for large K the standard
    practice is to scale the lr (linear or sqrt rule) and that choice is
    left to the caller (``engines.fast.static_train`` accepts a
    pre-built optimizer via its params/loaders hooks) —
    docs/architecture.md "Parallelism".
    """
    if global_batch in (None, ""):
        return batch_size
    n = jax.device_count()
    from styletransfer_tpu.utils.logging import get_logger

    if str(global_batch).lower() == "auto":
        resolved = batch_size * n
        get_logger().info(
            "--global-batch auto: -b %d is per-chip; global batch = %d "
            "over %d device(s). Adam lr stays at the reference default "
            "(1e-3) — consider the linear/sqrt lr-scaling rule for large "
            "global batches.",
            batch_size, resolved, n,
        )
        return resolved
    resolved = int(global_batch)
    if resolved < 1:
        raise ValueError(f"--global-batch must be >= 1, got {resolved}")
    get_logger().info(
        "--global-batch %d (explicit): overrides -b %d; %d device(s) "
        "available.", resolved, batch_size, n,
    )
    return resolved


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def frames_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 1 (batch) of a [T, B, ...] frame-chunk over the data axis."""
    return NamedSharding(mesh, P(None, axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (for params / optimizer state / scalars)."""
    return NamedSharding(mesh, P())


def _put(tree: Any, sharding: NamedSharding):
    """Place host data under ``sharding``, multi-process aware.

    Single-process: asynchronous ``jax.device_put`` (the transfer overlaps
    whatever the device is executing — what makes prefetch effective).
    Multi-process: each process holds only ITS shard of the global batch
    (the loader's ``shard_index/shard_count`` split), so the global array is
    assembled with ``jax.make_array_from_process_local_data``.
    """
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a batch sharded across the mesh's data axis.

    Multi-process: ``batch`` is this process's local slice (global batch /
    process count rows); the returned array is the global batch.
    """
    return _put(batch, batch_sharding(mesh, axis_name))


def shard_frames(chunk: Any, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a [T, B, ...] frame-chunk sharded on the batch axis."""
    return _put(chunk, frames_sharding(mesh, axis_name))


def replicate(tree: Any, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-process: every process must hold the same host values (seeded
    init / checkpoint load are deterministic, so they do); the full value is
    each process's "local data" for the replicated global array.
    """
    return _put(tree, replicated_sharding(mesh))


def serving_placement(batch_size: int, params: Any):
    """The shared multi-chip placement policy of every batched serving path.

    Builds ``auto_mesh(batch_size)`` (which logs idle devices) and returns
    ``(params, place, place_frames, place_params)``: ``place(tree)``
    shards a batch-leading pytree over the mesh's data axis,
    ``place_frames(tree)`` shards axis 1 of a ``[T, B, ...]`` chunk,
    ``params`` come back replicated, and ``place_params(tree)`` applies
    that same replication to NEW params later (the daemons' ``RELOAD``).
    On a single device all are plain ``jnp.asarray`` placement — the
    identical program to an unsharded run — so serving code calls this
    unconditionally. Used by ``fast.process_dir`` / ``fast.serve_loop`` /
    ``multistyle.serve_loop`` / ``video.process_video_dir`` /
    ``video.serve_stream_loop`` / ``gatys.serve_loop`` (docs/serving.md
    "Scaling out").
    """
    import jax.numpy as jnp

    # A serial path (batch 1) never shards; skip auto_mesh so a deliberate
    # single-lane daemon on a multi-chip host doesn't log its idle-devices
    # warning (that hint is for batch sizes that COULD have sharded).
    mesh = auto_mesh(batch_size) if batch_size > 1 else None
    if mesh is None or mesh.devices.size <= 1:
        def asarray(tree: Any):
            return jax.tree_util.tree_map(jnp.asarray, tree)

        return params, asarray, asarray, asarray

    def place_params(tree: Any):
        return replicate(tree, mesh)

    return (
        replicate(params, mesh),
        lambda tree: shard_batch(tree, mesh),
        lambda tree: shard_frames(tree, mesh),
        place_params,
    )
