"""Persistent XLA compilation cache + global precision knob.

Compiles of the jitted train/infer programs are expensive (minutes through
the tunneled TPU backend); the persistent cache makes every CLI invocation
after the first reuse them. Enabled automatically at package import
(:mod:`styletransfer_tpu.__init__`); opt out with ``STX_NO_COMPILE_CACHE=1``
or point elsewhere with ``STX_COMPILE_CACHE_DIR``.

``STX_PLATFORM`` (also applied at import) forces JAX's platform selection
via the ``jax_platforms`` config update — honored by plugin backends that
ignore the ``JAX_PLATFORMS`` environment variable — so every CLI has a
deliberate CPU-only mode: ``STX_PLATFORM=cpu python -m styletransfer_tpu``.

``STX_MATMUL_PRECISION`` (also applied at import) sets JAX's default
matmul/conv precision: TPU "f32" convs run the MXU in its default
single-pass-bf16 mode — the standard XLA/TPU behavior behind the headline
throughput numbers. ``STX_MATMUL_PRECISION=highest`` makes every conv and
matmul accumulate at full f32 (three bf16 passes on the MXU), which is the
knob for ~bit-faithful parity with torch-CPU outputs at a measured
throughput cost (docs/performance.md).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "styletransfer_tpu", "xla_cache"
)

_enabled = False


def cache_dir() -> str:
    """The persistent compile cache location (env override honored)."""
    return os.environ.get("STX_COMPILE_CACHE_DIR", _DEFAULT_DIR)


def apply_platform() -> None:
    """Apply ``STX_PLATFORM`` (e.g. ``cpu``) to JAX's platform selection.

    Some plugin backends (e.g. tunneled TPU services) register themselves
    unconditionally and ignore the ``JAX_PLATFORMS`` environment variable;
    the ``jax_platforms`` config update below is honored before backend
    init regardless. This gives every CLI entry point a deliberate
    CPU-only mode (CI, laptops, or a TPU tunnel outage) without touching
    code: ``STX_PLATFORM=cpu python -m styletransfer_tpu ...``.
    """
    value = os.environ.get("STX_PLATFORM")
    if not value:
        return
    import jax

    try:
        jax.config.update("jax_platforms", value)
    except Exception:  # noqa: BLE001 - older jax without the option
        from styletransfer_tpu.utils.logging import get_logger

        get_logger().warning("could not apply STX_PLATFORM=%r; ignoring", value)


def enable_persistent_cache() -> None:
    """Idempotently enable the JAX persistent compilation cache."""
    global _enabled
    apply_platform()
    apply_matmul_precision()
    if _enabled or os.environ.get("STX_NO_COMPILE_CACHE") == "1":
        return
    import jax

    # One source of truth with doctor's report (cache_dir()): a drifted
    # duplicate lookup here would make diagnostics name a different
    # directory than the one actually in use.
    target_dir = cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", target_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 - older jax without these flags
        return
    _enabled = True


_VALID_PRECISIONS = ("default", "high", "highest", "bfloat16",
                     "bfloat16_3x", "tensorfloat32", "float32")


def apply_matmul_precision() -> None:
    """Apply ``STX_MATMUL_PRECISION`` to JAX's default matmul precision."""
    value = os.environ.get("STX_MATMUL_PRECISION")
    if not value:
        return
    if value not in _VALID_PRECISIONS:
        from styletransfer_tpu.utils.logging import get_logger

        get_logger().warning(
            "STX_MATMUL_PRECISION=%r is not one of %s; ignoring.",
            value, ", ".join(_VALID_PRECISIONS),
        )
        return
    import jax

    jax.config.update("jax_default_matmul_precision", value)
