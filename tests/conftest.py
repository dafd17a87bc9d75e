"""Test configuration: force JAX onto CPU with 8 virtual devices.

Tests never require TPU hardware; multi-device (data-parallel) paths are
exercised on a virtual 8-device CPU mesh via
``--xla_force_host_platform_device_count`` (the SURVEY.md §4 test strategy).
Must run before the first ``import jax`` in any test module.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# is authoritative and must happen before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect the virtual 8-device CPU mesh"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_image(tmp_path, rng):
    """A small RGB image file on disk."""
    from PIL import Image

    arr = rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8)
    path = tmp_path / "img.png"
    Image.fromarray(arr).save(path)
    return str(path)
