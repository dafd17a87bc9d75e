"""Pallas kernel tests (interpret mode on CPU) vs. the XLA reference impls."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styletransfer_tpu.ops.pallas import instance_norm as pin


@pytest.fixture
def data(rng):
    x = rng.standard_normal((3, 8, 16, 128)).astype(np.float32)
    scale = rng.standard_normal(128).astype(np.float32)
    bias = rng.standard_normal(128).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)


def test_fused_in_matches_reference(data):
    x, scale, bias = data
    ref = pin._xla_reference(x, scale, bias)
    out = pin._pallas_forward(x, scale, bias, None, relu=False, eps=1e-5,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_in_relu_matches_reference(data):
    x, scale, bias = data
    ref = pin._xla_reference(x, scale, bias, relu=True)
    out = pin._pallas_forward(x, scale, bias, None, relu=True, eps=1e-5,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    assert (np.asarray(out) >= 0).all()


def test_fused_in_residual_matches_reference(data, rng):
    x, scale, bias = data
    residual = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    ref = pin._xla_reference(x, scale, bias, residual=residual)
    out = pin._pallas_forward(x, scale, bias, residual, relu=False, eps=1e-5,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_in_bf16_io(data):
    x, scale, bias = data
    xb = x.astype(jnp.bfloat16)
    ref = pin._xla_reference(xb, scale, bias, relu=True)
    out = pin._pallas_forward(xb, scale, bias, None, relu=True, eps=1e-5,
                              interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_custom_vjp_matches_xla_grads(data):
    x, scale, bias = data

    def loss_fused(x_, s_, b_):
        return jnp.sum(pin._fused(x_, s_, b_, None, True, 1e-5, True) ** 2)

    def loss_ref(x_, s_, b_):
        return jnp.sum(pin._xla_reference(x_, s_, b_, relu=True) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_fused_entrypoint_cpu_falls_back(data):
    # On the CPU test backend the entry point must route to XLA and agree.
    x, scale, bias = data
    out = pin.fused_instance_norm(x, scale, bias, relu=True)
    ref = pin._xla_reference(x, scale, bias, relu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_fused_in_padded_matches_pad_of_reference(rng):
    """The pad-writing kernel == reflect-pad of the XLA reference, across
    pad widths, relu, and (padded-)residual variants."""
    import jax.numpy as jnp

    for (b, h, w, c), pad, relu, respad in [
        ((2, 16, 16, 32), 1, True, None),
        ((2, 16, 16, 32), 4, True, None),
        ((2, 16, 16, 128), 1, False, 1),
        ((2, 16, 16, 64), 0, False, 0),
    ]:
        x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        s = jnp.asarray(rng.standard_normal(c), jnp.float32)
        bb = jnp.asarray(rng.standard_normal(c), jnp.float32)
        residual = None
        if respad is not None:
            residual = jnp.asarray(
                rng.standard_normal((b, h + 2 * respad, w + 2 * respad, c)),
                jnp.float32,
            )
        got = pin.fused_instance_norm_padded(
            x, s, bb, residual=residual, relu=relu, pad=pad,
            res_is_padded=respad or 0, interpret=True,
        )
        res_inner = None
        if residual is not None:
            res_inner = (residual[:, respad:-respad, respad:-respad, :]
                         if respad else residual)
        want = pin._xla_reference(x, s, bb, res_inner, relu, 1e-5)
        if pad:
            want = jnp.pad(want, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                           mode="reflect")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
