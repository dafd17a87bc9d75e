"""AOT executable cache (utils/aot.py) on the CPU backend.

The serving paths use :func:`aot.cached_compile` behind ``STX_AOT_CACHE=1``
(default off — see the measured rejection in docs/serving.md). These tests
pin the mechanics: save on first compile, load on second, transparent jit
fallback when disabled or when the cache entry is corrupt.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styletransfer_tpu.utils import aot


@pytest.fixture()
def aot_env(tmp_path, monkeypatch):
    monkeypatch.setenv("STX_AOT_CACHE", "1")
    monkeypatch.setenv("STX_AOT_CACHE_DIR", str(tmp_path))
    return tmp_path


def _fn(a, b):
    return jnp.tanh(a) @ b + 1.0


def test_cached_compile_saves_then_loads(aot_env):
    a = jnp.ones((4, 8), jnp.float32)
    b = jnp.ones((8, 4), jnp.float32)
    expect = np.asarray(jax.jit(_fn)(a, b))

    first = aot.cached_compile(_fn, (a, b), "t")
    np.testing.assert_allclose(np.asarray(first(a, b)), expect, rtol=1e-6)
    entries = [f for f in os.listdir(aot_env) if f.endswith(".aotx")]
    assert len(entries) == 1

    second = aot.cached_compile(_fn, (a, b), "t")
    np.testing.assert_allclose(np.asarray(second(a, b)), expect, rtol=1e-6)
    # Still exactly one entry — the second call loaded, not re-saved.
    assert [f for f in os.listdir(aot_env) if f.endswith(".aotx")] == entries


def test_cached_compile_disabled_returns_jit(monkeypatch):
    monkeypatch.delenv("STX_AOT_CACHE", raising=False)
    a = jnp.ones((2, 2), jnp.float32)
    fn = aot.cached_compile(_fn, (a, a), "t")
    np.testing.assert_allclose(
        np.asarray(fn(a, a)), np.asarray(jax.jit(_fn)(a, a)), rtol=1e-6
    )


def test_cached_compile_corrupt_entry_falls_back(aot_env):
    a = jnp.ones((4, 8), jnp.float32)
    b = jnp.ones((8, 4), jnp.float32)
    aot.cached_compile(_fn, (a, b), "t")
    (entry,) = [f for f in os.listdir(aot_env) if f.endswith(".aotx")]
    with open(os.path.join(aot_env, entry), "wb") as f:
        f.write(b"not a pickle")
    fn = aot.cached_compile(_fn, (a, b), "t")
    np.testing.assert_allclose(
        np.asarray(fn(a, b)), np.asarray(jax.jit(_fn)(a, b)), rtol=1e-6
    )


def test_key_is_stable_across_source_locations(aot_env):
    """Two lambdas with identical math defined on different lines produce
    the same cache key (location metadata is stripped from the hash)."""
    a = jnp.ones((4,), jnp.float32)

    f1 = lambda x: x * 2 + 1  # noqa: E731
    f2 = lambda x: x * 2 + 1  # noqa: E731 (different source line)
    k1 = aot._key("n", jax.jit(f1).lower(a).as_text())
    k2 = aot._key("n", jax.jit(f2).lower(a).as_text())
    assert k1 == k2


def test_tampered_entry_is_rejected_before_unpickling(aot_env, monkeypatch):
    """A byte-flipped entry fails the digest check — the unpickler (which
    executes code) must never see an entry whose digest doesn't match."""
    import pickle

    a = jnp.ones((4, 8), jnp.float32)
    b = jnp.ones((8, 4), jnp.float32)
    aot.cached_compile(_fn, (a, b), "t")
    (entry,) = [f for f in os.listdir(aot_env) if f.endswith(".aotx")]
    path = os.path.join(aot_env, entry)
    blob = bytearray(open(path, "rb").read())
    blob[-1] ^= 0xFF  # flip a byte INSIDE the pickle body
    open(path, "wb").write(bytes(blob))

    loads_called = []
    real_loads = pickle.loads
    monkeypatch.setattr(
        pickle, "loads", lambda *a_, **k_: loads_called.append(1) or real_loads(*a_, **k_)
    )
    fn = aot.cached_compile(_fn, (a, b), "t")  # falls back to fresh compile
    assert not loads_called, "tampered payload reached pickle.loads"
    np.testing.assert_allclose(
        np.asarray(fn(a, b)), np.asarray(jax.jit(_fn)(a, b)), rtol=1e-6
    )


def test_unframe_round_trip_and_rejection():
    body = b"payload-bytes"
    assert aot._unframe(aot._frame(body)) == body
    with pytest.raises(ValueError):
        aot._unframe(b"WRONGMAGIC" + body)
    framed = bytearray(aot._frame(body))
    framed[-1] ^= 0x01
    with pytest.raises(ValueError):
        aot._unframe(bytes(framed))
