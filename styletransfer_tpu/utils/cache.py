"""Persistent XLA compilation cache.

Compiles of the jitted train/infer programs are expensive (minutes through
the tunneled TPU backend); the persistent cache makes every CLI invocation
after the first reuse them. Enabled automatically at package import
(:mod:`styletransfer_tpu.__init__`); opt out with ``STX_NO_COMPILE_CACHE=1``
or point elsewhere with ``STX_COMPILE_CACHE_DIR``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "styletransfer_tpu", "xla_cache"
)

_enabled = False


def enable_persistent_cache() -> None:
    """Idempotently enable the JAX persistent compilation cache."""
    global _enabled
    if _enabled or os.environ.get("STX_NO_COMPILE_CACHE") == "1":
        return
    import jax

    cache_dir = os.environ.get("STX_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 - older jax without these flags
        return
    _enabled = True
