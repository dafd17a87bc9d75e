"""AOT executable cache: serve without paying the tunnel compile.

The persistent XLA compilation cache (:mod:`styletransfer_tpu.utils.cache`)
keys on the exact HLO, so the *first* run of any serving shape in a fresh
environment still pays the full backend compile — minutes through the
tunneled TPU (BENCH_r02: ``fast_st compile+first: 217.3s``). This module
removes that cost for the fixed serving shapes by serializing the **compiled
executable** itself (``jax.experimental.serialize_executable``, i.e. the
PJRT executable image) to disk, keyed by a hash of the lowered StableHLO:

- ``cached_compile(fn, args, name)`` lowers ``fn`` at the given example
  arguments (pure host-side tracing — cheap), hashes the module text with
  source locations stripped (so edits that only move code don't re-key),
  and either deserializes a previously saved executable or compiles and
  saves one.
- Any failure — incompatible device, jax version bump, corrupt file —
  falls back to a normal ``jit`` compile transparently.

The cache lives next to the XLA cache (``~/.cache/styletransfer_tpu/aot``;
override with ``STX_AOT_CACHE_DIR``). Entries are device-kind +
jax-version scoped, so a directory shared across heterogeneous hosts never
loads a mismatched binary.

**Trust assumption:** entries are pickles, and unpickling executes code —
the cache directory must be writable only by principals you'd let run
arbitrary code as you (it is created ``0o700``; don't point
``STX_AOT_CACHE_DIR`` at a world- or group-writable path, and don't share
it across trust domains). Each entry carries a SHA-256 digest that is
verified before unpickling; that rejects corruption and casual tampering,
but it is NOT a MAC — there is no secret, so anyone who can write the
directory can forge a valid entry. Filesystem permissions are the
security boundary.

**Default OFF (opt in with ``STX_AOT_CACHE=1``) — measured rejection on
the tunneled ``axon`` backend (2026-08-17):** serialize/deserialize round-
trips work, but the *first execution* of a deserialized executable blocks
for >10 minutes (the experimental backend appears to re-prepare the loaded
image server-side without consulting the compilation cache), while plain
``jit`` + the persistent XLA compilation cache (utils/cache.py) warm-starts
the same serving program in ~5 s (see docs/serving.md for the numbers).
On a standard Cloud TPU PJRT backend this module is the intended cold-start
path; enable it there.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import re
from typing import Any, Callable, Sequence

from styletransfer_tpu.utils.logging import get_logger

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "styletransfer_tpu", "aot"
)

_LOC_RE = re.compile(r"loc\(.*?\)|#loc\d*(?: = .*)?$", re.MULTILINE)

# Entry framing: magic + sha256(body) + pickle body. The digest is checked
# BEFORE pickle.load so a truncated/corrupted/foreign file never reaches the
# unpickler (see the module docstring's trust assumption).
_MAGIC = b"STXAOT1\n"


def _frame(body: bytes) -> bytes:
    return _MAGIC + hashlib.sha256(body).digest() + body


def _unframe(blob: bytes) -> bytes:
    if not blob.startswith(_MAGIC):
        raise ValueError("not an STXAOT1 cache entry")
    digest, body = blob[len(_MAGIC):len(_MAGIC) + 32], blob[len(_MAGIC) + 32:]
    if hashlib.sha256(body).digest() != digest:
        raise ValueError("cache entry digest mismatch (corrupt or tampered)")
    return body


def _cache_dir() -> str:
    return os.environ.get("STX_AOT_CACHE_DIR", _DEFAULT_DIR)


def _enabled() -> bool:
    return os.environ.get("STX_AOT_CACHE") == "1"


def _key(name: str, lowered_text: str) -> str:
    import jax

    # Strip MLIR source locations: they encode file:line of the tracing
    # call sites, which move on unrelated edits (the XLA-cache re-keying
    # problem documented in docs/performance.md).
    canonical = _LOC_RE.sub("", lowered_text)
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(jax.devices()[0].device_kind.encode())
    h.update(canonical.encode())
    return f"{name}-{h.hexdigest()[:20]}"


def cached_compile(
    fn: Callable,
    example_args: Sequence[Any],
    name: str,
) -> Callable:
    """Compile ``jit(fn)`` for ``example_args``'s shapes, reusing a
    serialized executable when one exists.

    Returns a callable with the same signature as ``fn`` (positional args
    only, shapes/dtypes must match ``example_args`` exactly — the serving
    contract). Falls back to plain ``jax.jit(fn)`` on any cache failure.
    """
    import jax

    logger = get_logger()
    jitted = jax.jit(fn)
    if not _enabled():
        return jitted

    try:
        lowered = jitted.lower(*example_args)
        key = _key(name, lowered.as_text())
    except Exception as exc:  # noqa: BLE001 - never let caching break serving
        logger.warning("AOT cache: lowering for key failed (%s); using jit", exc)
        return jitted

    path = os.path.join(_cache_dir(), key + ".aotx")
    if os.path.isfile(path):
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load,
            )

            with open(path, "rb") as f:
                body = _unframe(f.read())
            payload, in_tree, out_tree, n_devices = pickle.loads(body)
            # Bind to the same number of devices the executable was compiled
            # for (deserialize_and_load defaults to ALL local devices, which
            # mis-loads single-device programs on multi-device hosts).
            compiled = deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=jax.devices()[:n_devices],
            )
            logger.info("AOT cache: loaded precompiled %s (%s)", name, path)
            return compiled
        except Exception as exc:  # noqa: BLE001 - stale/corrupt/mismatched
            logger.warning(
                "AOT cache: failed to load %s (%s); recompiling", path, exc
            )

    try:
        compiled = lowered.compile()
    except Exception as exc:  # noqa: BLE001
        logger.warning("AOT cache: AOT compile failed (%s); using jit", exc)
        return jitted
    try:
        from jax.experimental.serialize_executable import serialize

        payload, in_tree, out_tree = serialize(compiled)
        try:
            n_devices = len(compiled._executable.xla_executable.local_devices())
        except Exception:  # noqa: BLE001 - conservative fallback
            n_devices = 1
        os.makedirs(_cache_dir(), mode=0o700, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(_frame(pickle.dumps((payload, in_tree, out_tree, n_devices))))
        os.replace(tmp, path)
        logger.info("AOT cache: saved %s executable to %s", name, path)
    except Exception as exc:  # noqa: BLE001 - serialization unsupported
        logger.warning("AOT cache: could not serialize %s (%s)", name, exc)
    return compiled
