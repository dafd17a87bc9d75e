"""Multi-host (multi-process) distributed execution.

The reference has no distributed code at all (SURVEY.md §2.2: no process
groups, no collectives — one global torch device, constants.py:20). The
TPU-native equivalent is ``jax.distributed.initialize`` + a global
``jax.sharding.Mesh`` spanning every process's devices: each host decodes a
disjoint shard of the corpus (``DataLoader(shard_index, shard_count)`` —
data/coco.py), assembles its local slice of the global batch with
``jax.make_array_from_process_local_data``, and the jitted train step is
unchanged — XLA inserts the gradient all-reduce across ICI/DCN from the
shardings exactly as it does single-host.

Configuration is environment-driven (one process per host):

- ``STX_COORDINATOR_ADDRESS`` — ``ip:port`` of process 0.
- ``STX_NUM_PROCESSES`` — total process count.
- ``STX_PROCESS_ID`` — this process's rank.

(``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` are
honored too, and on managed platforms — Cloud TPU pods, SLURM —
``jax.distributed.initialize()`` auto-detects everything, so setting only
``STX_DISTRIBUTED=1`` suffices there.)

CLI surface: every trainer accepts ``--distributed``; the engines call
:func:`process_info` when building their own loaders so host sharding is
automatic once initialized.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from styletransfer_tpu.utils.logging import get_logger

_ENV_PREFIXES = ("STX", "JAX")

_initialized = False


def _env(name: str) -> Optional[str]:
    for prefix in _ENV_PREFIXES:
        value = os.environ.get(f"{prefix}_{name}")
        if value:
            return value
    return None


def is_configured() -> bool:
    """True when the environment requests multi-process execution."""
    return bool(
        _env("COORDINATOR_ADDRESS")
        or os.environ.get("STX_DISTRIBUTED")
    )


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize ``jax.distributed`` from args or the environment.

    Idempotent: returns ``(process_index, process_count)`` without
    reinitializing if the runtime is already up, and is a no-op returning
    ``(0, 1)`` when nothing requests distribution — so trainers can call it
    unconditionally.

    Must run before the first JAX backend touch on each process (the same
    contract as ``jax.distributed.initialize`` — for that reason this
    function must NOT query the backend before deciding whether to
    initialize).
    """
    global _initialized
    logger = get_logger()

    coordinator_address = coordinator_address or _env("COORDINATOR_ADDRESS")
    if num_processes is None:
        raw = _env("NUM_PROCESSES")
        num_processes = int(raw) if raw else None
    if process_id is None:
        raw = _env("PROCESS_ID")
        process_id = int(raw) if raw else None

    if not (coordinator_address or os.environ.get("STX_DISTRIBUTED")):
        return 0, 1  # single-process run; nothing to do
    if _initialized:
        return jax.process_index(), jax.process_count()

    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as exc:
        # Backend already up (e.g. the launcher initialized it, or a JAX
        # computation ran first) — surface loudly but keep going with
        # whatever runtime exists.
        logger.warning("jax.distributed.initialize failed/skipped: %s", exc)
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return jax.process_index(), jax.process_count()


def process_info() -> Tuple[int, int]:
    """(process_index, process_count) of the running JAX runtime.

    Safe to call whether or not :func:`initialize` ran — single-process
    returns (0, 1). Engines pass this straight into
    ``DataLoader(shard_index=..., shard_count=...)`` so each host decodes a
    disjoint corpus shard.
    """
    return jax.process_index(), jax.process_count()


def local_batch_size(global_batch_size: int) -> int:
    """This process's slice of a global batch.

    The global batch must divide evenly across processes (static shapes —
    the same constraint the mesh puts on devices).
    """
    count = jax.process_count()
    if global_batch_size % count:
        raise ValueError(
            f"global batch size {global_batch_size} must be divisible by "
            f"the process count {count}"
        )
    return global_batch_size // count


def agree_resume_state(state, extra_keys: Tuple[str, ...] = ("batch_in_epoch",)):
    """Collectively validate a loaded step state's resume POSITION.

    Encodes ``(present, epoch, iteration, *extras)`` and all-gathers it
    (:func:`positions_agree`): if any process loaded a different position
    — step-state file missing or stale on some hosts — EVERY process
    returns ``None`` together (epoch-level resume); per-process fallback
    would desync the mesh. Returns ``state`` unchanged when all agree.
    One helper for the three trainers so their encodings cannot drift.
    """
    if positions_agree(
        0 if state is None else 1,
        0 if state is None else int(state["epoch"]),
        0 if state is None else int(state["iteration"]),
        *(0 if state is None else int(state["extra"].get(k, 0))
          for k in extra_keys),
    ):
        return state
    get_logger().warning(
        "Step-state resume positions differ across processes "
        "(this process: %s); ALL processes fall back to epoch-level resume.",
        "none" if state is None else
        f"epoch={state['epoch']} iter={state['iteration']}",
    )
    return None


def positions_agree(*values: int) -> bool:
    """True iff every process computed the same integer tuple.

    Resume decisions that set a process's position in the train loop
    (epoch, iteration, batch/chunk offsets) MUST be identical everywhere:
    a host whose step-state file is missing or stale would otherwise start
    at a different loop position than its peers — mismatched collective
    participation and a distributed hang. One tiny all-gather at startup
    buys the check; trivially True single-process.
    """
    import numpy as np

    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    local = np.asarray(values, dtype=np.int64)
    gathered = np.asarray(multihost_utils.process_allgather(local))
    return bool((gathered == gathered[0]).all())


_EXHAUSTED = object()


def lockstep(iterable):
    """Iterate in MULTI-HOST LOCKSTEP: yield while EVERY process has an
    item; when any host's source runs out, all hosts stop together (peers
    drop their local remainder).

    The training loops run collective steps (sharded train/eval steps)
    once per yielded item, and collectives require every process to
    participate the same number of times — but per-host work counts are
    NOT naturally equal: corpus shards differ by up to one item
    (``idx[shard_index::shard_count]``), so batch counts can differ by
    one, and the video trainer's frame iterator stops at the shortest
    clip of each host's LOCAL batch, so chunk counts differ whenever clip
    lengths do. Without this gate one host exits its loop while a peer
    blocks forever inside a collective — a distributed hang, the
    multi-host analogue of ``drop_last``. One tiny int all-gather per
    item buys the agreement (negligible next to a training step);
    single-process iteration is passed through untouched.
    """
    if jax.process_count() == 1:
        yield from iterable
        return
    import numpy as np
    from jax.experimental import multihost_utils

    it = iter(iterable)
    while True:
        item = next(it, _EXHAUSTED)
        have = item is not _EXHAUSTED
        gathered = np.asarray(
            multihost_utils.process_allgather(
                np.asarray([1 if have else 0], dtype=np.int64)
            )
        )
        if gathered.min() != 1:
            if have:
                get_logger().info(
                    "lockstep: a peer process exhausted its shard; "
                    "dropping this host's remaining items",
                )
            return
        yield item
