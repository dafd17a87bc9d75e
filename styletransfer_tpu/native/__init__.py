"""Native (C) components with build-on-first-use and pure-Python fallbacks.

The compute path is Pallas/XLA; this package holds the small host-side
native pieces where Python is measurably slow. Each component compiles its
shared library on first use with the system C compiler into
``~/.cache/styletransfer_tpu/native`` and falls back to a pure-Python
implementation when no compiler is available — the framework never *requires*
a toolchain at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Callable, Optional

from styletransfer_tpu.utils.logging import get_logger

_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "styletransfer_tpu", "native"
)
_SRC_DIR = os.path.dirname(os.path.abspath(__file__))

_crc32c_fn: Optional[Callable[[bytes], int]] = None


def _build(src_name: str, lib_name: str) -> Optional[str]:
    """Compile ``src_name`` to a cached shared library; None on failure."""
    src = os.path.join(_SRC_DIR, src_name)
    lib = os.path.join(_CACHE_DIR, lib_name)
    if not os.path.isfile(src):
        # Source not shipped (or stripped install): use a cached build if
        # one exists, else fall back to pure Python.
        return lib if os.path.isfile(lib) else None
    if os.path.isfile(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    os.makedirs(_CACHE_DIR, exist_ok=True)
    for cc in ("cc", "gcc", "clang"):
        # Compile to a pid-unique temp name + atomic rename: two cold-cache
        # processes (parallel CLIs sharing ~/.cache) racing the SAME output
        # path could CDLL a partially written .so — and a build killed
        # mid-write would leave a corrupt library whose fresh mtime makes
        # every later run take the cached path and crash.
        tmp = f"{lib}.tmp.{os.getpid()}"
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", tmp, src],
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.replace(tmp, lib)
            return lib
        except (OSError, subprocess.SubprocessError):
            try:
                os.remove(tmp)
            except OSError:
                pass
            continue
    get_logger().debug("No C compiler available; using pure-Python fallback")
    return None


def crc32c(data: bytes) -> int:
    """CRC32C via the native library when buildable, else pure Python."""
    global _crc32c_fn
    if _crc32c_fn is None:
        try:
            lib_path = _build("crc32c.c", "libstxcrc32c.so")
            if lib_path:
                lib = ctypes.CDLL(lib_path)
                lib.crc32c.restype = ctypes.c_uint32
                lib.crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]

                def native(d: bytes) -> int:
                    return lib.crc32c(d, len(d))

                _crc32c_fn = native
        except OSError as exc:
            # A corrupt cached .so (e.g. from a pre-atomic-build version)
            # must degrade to the pure-Python path, never crash the first
            # TB write of a training run.
            get_logger().warning(
                "Native CRC32C library unloadable (%s); using pure-Python "
                "fallback", exc,
            )
        if _crc32c_fn is None:
            from styletransfer_tpu.utils import tb

            _crc32c_fn = tb._crc32c_py
    return _crc32c_fn(data)
