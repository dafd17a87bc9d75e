"""Checkpoint save/load with the reference's naming + discovery contract.

Rebuild of the reference checkpoint I/O (network.py:38-76, 767-770,
1066-1069): per-epoch files under ``data/models/`` named
``{model}_{style}_epoch{e}``, "latest" discovery by model+style, and resume
semantics (skip an epoch whose checkpoint already exists).

Native format is msgpack-serialized JAX pytrees (flax.serialization) —
host-cheap, mmap-friendly, and independent of torch. Reference-produced
``.pth`` state dicts are read transparently through the torch importer
(:func:`styletransfer_tpu.models.transformer.import_torch_state_dict`), so
pretrained reference weights remain usable (README.md:64-68 workflow).

Quirk handled deliberately (SURVEY.md §"quirks"): the reference picks
"latest" by lexicographic filename sort, so ``epoch10`` sorts before
``epoch2`` (network.py:65-67). We parse the epoch number and sort
numerically, while still reading reference-named files.

Alternative backend: ``STX_CKPT_BACKEND=orbax`` writes epoch checkpoints
as Orbax OCDBT directories (``..._epoch{e}.orbax/``) instead of msgpack
files — same naming/discovery/resume contract, and both formats remain
readable regardless of the active backend (discovery prefers the native
formats over reference ``.pth`` at equal epochs). msgpack is the default
because at these model sizes (~6 MB) it is instant; orbax buys sharded,
scalable IO when params outgrow single-file writes (ROADMAP.md). Note
orbax save/restore initializes the JAX backend — under an accelerator
outage combine with ``STX_PLATFORM=cpu``.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from styletransfer_tpu import constants
from styletransfer_tpu.utils.logging import get_logger

_EPOCH_RE = re.compile(r"epoch(\d+)")

CKPT_SUFFIX = ".msgpack"
ORBAX_SUFFIX = ".orbax"

_orbax_checkpointer = None


def _ckpt_backend() -> str:
    backend = os.environ.get("STX_CKPT_BACKEND", "msgpack")
    if backend not in ("msgpack", "orbax"):
        raise ValueError(
            f"STX_CKPT_BACKEND must be 'msgpack' or 'orbax', got {backend!r}"
        )
    return backend


def _orbax():
    """Singleton orbax StandardCheckpointer (imported lazily — orbax pulls
    in the full jax device stack at save/restore time)."""
    global _orbax_checkpointer
    if _orbax_checkpointer is None:
        import orbax.checkpoint as ocp

        _orbax_checkpointer = ocp.StandardCheckpointer()
    return _orbax_checkpointer


def _models_dir(models_path: Optional[str] = None) -> str:
    path = models_path or constants.MODELS_PATH
    if not os.path.isabs(path):
        path = os.path.join(constants.PROJECT_ROOT_PATH, path)
    return path


def checkpoint_path(
    model_name: str, style_name: str, epoch: int, models_path: Optional[str] = None
) -> str:
    """``data/models/{model}_{style}_epoch{e}.msgpack`` (reference
    network.py:677); ``.orbax`` under ``STX_CKPT_BACKEND=orbax``."""
    suffix = ORBAX_SUFFIX if _ckpt_backend() == "orbax" else CKPT_SUFFIX
    return os.path.join(
        _models_dir(models_path), f"{model_name}_{style_name}_epoch{epoch}{suffix}"
    )


def save(params: Any, path: str) -> None:
    """Serialize a param pytree at ``path`` — msgpack bytes, or an Orbax
    OCDBT directory when the path carries the ``.orbax`` suffix."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(ORBAX_SUFFIX):
        ckr = _orbax()
        ckr.save(os.path.abspath(path), jax.device_get(params), force=True)
        # StandardCheckpointer commits asynchronously; this save() contract
        # is durable-on-return (resume logic stats the path right after).
        ckr.wait_until_finished()
        return
    data = serialization.to_bytes(jax.device_get(params))
    _atomic_write(path, data)


def _atomic_write(path: str, data: bytes) -> None:
    """tmp + rename so a crash mid-write never leaves a truncated file at
    the final name (a partial epoch checkpoint would make the resume-skip
    path load garbage and fail every restart until hand-deleted). The
    tmp name carries pid+tid: lockstepped multi-host trainers sharing a
    models dir all save at the same iteration, and a SHARED tmp name
    would interleave their writes before one rename promoted the mix."""
    import threading

    tmp = f"{path}.tmp.{os.getpid()}.{threading.get_native_id()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load(path: str, template: Any) -> Any:
    """Load a pytree saved by :func:`save` (either format), shaped like
    ``template``."""
    if path.endswith(ORBAX_SUFFIX):
        restored = _orbax().restore(os.path.abspath(path),
                                    jax.device_get(template))
        # Match the msgpack branch's contract: leaves shaped/typed like
        # the template, as host arrays the caller then places.
        return jax.tree.map(np.asarray, restored)
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_epoch(
    params: Any,
    model_name: str,
    style_name: str,
    epoch: int,
    models_path: Optional[str] = None,
) -> str:
    path = checkpoint_path(model_name, style_name, epoch, models_path)
    save(params, path)
    return path


def existing_checkpoint_path(
    model_name: str, style_name: str, epoch: int, models_path: Optional[str] = None
) -> Optional[str]:
    """The epoch's checkpoint path in WHICHEVER format actually exists
    (the active backend's format preferred when both do), or ``None``.

    The resume path must load through this, never through
    :func:`checkpoint_path` alone: that one carries only the ACTIVE
    backend's suffix, so after switching ``STX_CKPT_BACKEND`` it would
    name a file the previous backend never wrote and resume would crash
    instead of skipping the finished epoch. :func:`load` dispatches by
    suffix, so whichever path this returns loads correctly.
    """
    base = os.path.join(
        _models_dir(models_path), f"{model_name}_{style_name}_epoch{epoch}"
    )
    candidates = [base + CKPT_SUFFIX, base + ORBAX_SUFFIX]
    if _ckpt_backend() == "orbax":
        candidates.reverse()
    for path in candidates:
        if path.endswith(ORBAX_SUFFIX):
            if os.path.isdir(path):
                return path
        elif os.path.isfile(path):
            return path
    return None


def epoch_checkpoint_exists(
    model_name: str, style_name: str, epoch: int, models_path: Optional[str] = None
) -> bool:
    """Resume-skip check (reference network.py:681-685). An epoch saved
    under EITHER backend counts — switching ``STX_CKPT_BACKEND`` must not
    retrain finished epochs."""
    return existing_checkpoint_path(
        model_name, style_name, epoch, models_path
    ) is not None


def _epoch_of(filename: str) -> int:
    m = _EPOCH_RE.search(filename)
    return int(m.group(1)) if m else -1


def find_latest(
    model_name: str, style_name: str, models_path: Optional[str] = None
) -> Tuple[str, int]:
    """Find the newest checkpoint file for (model, style).

    Matches the reference's filename filter — startswith(model) and style in
    name (network.py:65-67) — accepting both our ``.msgpack`` files and
    reference ``.pth`` files, but sorts **numerically** by epoch.

    Returns ``(path, epoch)``; raises ``FileNotFoundError`` if none exist
    (the reference raises AssertionError with a critical log,
    network.py:68-74).
    """
    directory = _models_dir(models_path)
    try:
        # Match the style against the part after the model prefix only
        # (the reference's bare substring check — network.py:65-67 — can
        # false-match a short style name inside the model name itself).
        names = [
            x
            for x in os.listdir(directory)
            if x.startswith(model_name)
            and style_name in os.path.splitext(x)[0][len(model_name):]
            and (x.endswith(CKPT_SUFFIX) or x.endswith(".pth")
                 or (x.endswith(ORBAX_SUFFIX)
                     and os.path.isdir(os.path.join(directory, x))))
            # Mid-epoch states and per-process carry sidecars match the
            # name filter but are NOT weights files — selecting one would
            # crash load() with a confusing structure error instead of the
            # clean no-weights FileNotFoundError.
            and "_step_state" not in x
            and "_step_carry_" not in x
        ]
    except FileNotFoundError:
        names = []
    if not names:
        get_logger().critical(
            "There are no weights for the specified model name (%s) and style "
            "(%s). In the specified path: %s",
            model_name, style_name, directory,
        )
        raise FileNotFoundError(
            f"No weights for model {model_name!r} and style {style_name!r} in {directory}"
        )
    # Prefer higher epoch; among equal epochs prefer the native formats
    # (msgpack, then orbax) over reference .pth.
    names.sort(key=lambda n: (_epoch_of(n), n.endswith(CKPT_SUFFIX),
                              n.endswith(ORBAX_SUFFIX)))
    chosen = names[-1]
    return os.path.join(directory, chosen), _epoch_of(chosen)


# ---------------------------------------------------------------------------
# Step-level checkpointing (finer than the reference's per-epoch contract —
# SURVEY.md §5 calls for step-level resume in the TPU build).
# ---------------------------------------------------------------------------


def step_state_path(model_name: str, style_name: str,
                    models_path: Optional[str] = None) -> str:
    return os.path.join(
        _models_dir(models_path), f"{model_name}_{style_name}_step_state{CKPT_SUFFIX}"
    )


def save_step_state(
    params: Any,
    opt_state: Any,
    epoch: int,
    iteration: int,
    model_name: str,
    style_name: str,
    models_path: Optional[str] = None,
    extra: Optional[Dict[str, int]] = None,
    arrays: Optional[Dict[str, Any]] = None,
) -> str:
    """Atomically save mid-training state (params + optimizer + position).

    ``extra`` holds additional integer run flags that must survive a resume
    (e.g. the video trainer's warm-start flag); ``arrays`` holds additional
    array state (e.g. the video trainer's recurrent carry frames). Written
    via a temp file + rename so a crash mid-write never corrupts the
    resumable state.
    """
    path = step_state_path(model_name, style_name, models_path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    state = {
        "params": jax.device_get(params),
        "opt_state": jax.device_get(opt_state),
        "epoch": np.int64(epoch),
        "iteration": np.int64(iteration),
        "extra": {k: np.int64(v) for k, v in (extra or {}).items()},
        "arrays": {k: np.asarray(jax.device_get(v)) for k, v in (arrays or {}).items()},
    }
    _atomic_write(path, serialization.to_bytes(state))
    return path


def load_step_state(
    params_template: Any,
    opt_state_template: Any,
    model_name: str,
    style_name: str,
    models_path: Optional[str] = None,
    extra_keys: Tuple[str, ...] = (),
    array_keys: Tuple[str, ...] = (),
):
    """Load mid-training state if present; returns the state dict or None.

    ``array_keys`` names entries of the saved ``arrays`` dict to restore
    (shapes come from the stored data, so the template uses placeholders).
    States saved before the ``arrays`` field existed load with
    ``state["arrays"] == {}``.
    """
    path = step_state_path(model_name, style_name, models_path)
    if not os.path.isfile(path):
        return None
    template = {
        "params": params_template,
        "opt_state": opt_state_template,
        "epoch": np.int64(0),
        "iteration": np.int64(0),
        "extra": {k: np.int64(0) for k in extra_keys},
        "arrays": {k: np.zeros(0, np.float32) for k in array_keys},
    }
    with open(path, "rb") as f:
        data = f.read()
    try:
        state = serialization.from_bytes(template, data)
    except (KeyError, ValueError):
        # Legacy / drifted state: the stored dict may predate the "arrays"
        # field, hold a different arrays key set (e.g. a post-epoch save), or
        # lack "extra" keys this code version now requires (e.g. the video
        # trainer's batch_in_epoch/chunk_in_batch added after a state was
        # written). Decode the raw state dict to see what is actually stored,
        # restore exactly those keys, and default everything missing.
        raw = serialization.msgpack_restore(data)
        template["extra"] = {k: np.int64(0) for k in raw.get("extra", {})}
        if "arrays" in raw:
            template["arrays"] = {
                k: np.zeros(0, np.float32) for k in raw["arrays"]
            }
        else:
            del template["arrays"]
        state = serialization.from_bytes(template, data)
        state.setdefault("arrays", {})
        state["extra"] = {
            **{k: np.int64(0) for k in extra_keys}, **state["extra"]
        }
    state["arrays"] = {k: v for k, v in state["arrays"].items() if np.size(v)}
    get_logger().info(
        "Restored step state from %s (epoch %d, iteration %d)",
        path, int(state["epoch"]), int(state["iteration"]),
    )
    return state


def carry_shard_path(
    model_name: str,
    style_name: str,
    models_path: Optional[str] = None,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> str:
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    return os.path.join(
        _models_dir(models_path),
        f"{model_name}_{style_name}_step_carry_"
        f"p{process_index}of{process_count}{CKPT_SUFFIX}",
    )


def save_carry_shards(
    arrays: Dict[str, Any],
    iteration: int,
    model_name: str,
    style_name: str,
    models_path: Optional[str] = None,
) -> str:
    """Save this process's addressable batch-shards of sharded carry arrays.

    Multi-host trainers cannot ``device_get`` a globally-sharded array (a
    process can only fetch its addressable shards), so the recurrent carry
    is persisted as one sidecar per process holding the LOCAL batch rows —
    the exact slice ``mesh.shard_batch`` expects back on resume. The file
    records the save's ``iteration`` so a resume can reject a sidecar that
    is stale relative to the main step state (crash between the two
    writes). Atomic via temp-file + rename, like the main state.
    """
    local = {}
    for k, v in arrays.items():
        shards = sorted(
            v.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        local[k] = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    path = carry_shard_path(model_name, style_name, models_path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    state = {"iteration": np.int64(iteration), "arrays": local}
    _atomic_write(path, serialization.to_bytes(state))
    return path


def load_carry_shards(
    iteration: int,
    model_name: str,
    style_name: str,
    models_path: Optional[str] = None,
    array_keys: Tuple[str, ...] = (),
):
    """Load this process's carry sidecar if it matches ``iteration``.

    Returns the dict of LOCAL arrays (to be reassembled with
    ``mesh.shard_batch``) or ``None`` when the sidecar is absent, stale
    (iteration mismatch), unreadable, or missing a requested key — all of
    which mean the caller should fall back to batch-level resume. The
    filename encodes (process_index, process_count), so a restart with a
    different topology never loads a mismatched shard.
    """
    path = carry_shard_path(model_name, style_name, models_path)
    if not os.path.isfile(path):
        return None
    template = {
        "iteration": np.int64(0),
        "arrays": {k: np.zeros(0, np.float32) for k in array_keys},
    }
    with open(path, "rb") as f:
        data = f.read()
    try:
        state = serialization.from_bytes(template, data)
    except (KeyError, ValueError):
        return None
    if int(state["iteration"]) != int(iteration):
        get_logger().warning(
            "Carry sidecar %s is at iteration %d but the step state is at "
            "%d; ignoring it (batch-level resume).",
            path, int(state["iteration"]), int(iteration),
        )
        return None
    arrays = state["arrays"]
    if any(np.size(arrays.get(k, ())) == 0 for k in array_keys):
        return None
    return arrays


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``.pth`` state dict into numpy arrays (CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}


def load_latest_transformer(
    model_name: str,
    style_name: str,
    template: Any,
    models_path: Optional[str] = None,
) -> Tuple[Any, int]:
    """Load the latest transform-net weights for (model, style).

    Equivalent of ``_load_latest_model_weigths`` (network.py:53-76) followed
    by ``load_state_dict``: reads our msgpack natively and reference ``.pth``
    dicts through the layout converter.
    """
    from styletransfer_tpu.models import transformer

    path, epoch = find_latest(model_name, style_name, models_path)
    if path.endswith(".pth"):
        params = transformer.import_torch_state_dict(load_torch_state_dict(path))
    else:
        params = load(path, template)
    get_logger().info("Loaded %s (epoch %d)", path, epoch)
    return params, epoch
