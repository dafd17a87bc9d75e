"""Parity tests for the NHWC layer primitives vs. torch NCHW equivalents.

Validates the building blocks of the transform nets: reflection-padded conv
(network.py:525-530 semantics), affine instance norm (network.py:531), and
nearest upsample (network.py:580-581).
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from styletransfer_tpu.ops import layers


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_reflect_conv_matches_torch(rng):
    x = rng.standard_normal((2, 10, 9, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)  # HWIO
    b = rng.standard_normal(6).astype(np.float32)

    ours = np.asarray(layers.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))

    tw = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())  # OIHW
    tx = F.pad(_nchw(x), (1, 1, 1, 1), mode="reflect")
    theirs = F.conv2d(tx, tw, torch.from_numpy(b))
    np.testing.assert_allclose(ours, _to_nhwc(theirs), rtol=1e-4, atol=1e-5)


def test_strided_reflect_conv_matches_torch(rng):
    # stride-2 downsampling conv as in network.py:534-542
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 8)).astype(np.float32)
    b = np.zeros(8, dtype=np.float32)

    ours = np.asarray(
        layers.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2)
    )
    tw = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())
    tx = F.pad(_nchw(x), (1, 1, 1, 1), mode="reflect")
    theirs = F.conv2d(tx, tw, torch.from_numpy(b), stride=2)
    np.testing.assert_allclose(ours, _to_nhwc(theirs), rtol=1e-4, atol=1e-5)


def test_large_kernel_reflect_conv(rng):
    # 9x9 kernel, pad 4 — the net's first/last convs (network.py:525-530, 603-609)
    x = rng.standard_normal((1, 12, 12, 3)).astype(np.float32)
    w = rng.standard_normal((9, 9, 3, 4)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)

    ours = np.asarray(layers.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    tw = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())
    tx = F.pad(_nchw(x), (4, 4, 4, 4), mode="reflect")
    theirs = F.conv2d(tx, tw, torch.from_numpy(b))
    np.testing.assert_allclose(ours, _to_nhwc(theirs), rtol=1e-4, atol=1e-4)


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((2, 7, 5, 6)).astype(np.float32)
    scale = rng.standard_normal(6).astype(np.float32)
    bias = rng.standard_normal(6).astype(np.float32)

    ours = np.asarray(
        layers.instance_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    )
    m = torch.nn.InstanceNorm2d(6, affine=True)
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(scale))
        m.bias.copy_(torch.from_numpy(bias))
    theirs = m(_nchw(x))
    np.testing.assert_allclose(ours, _to_nhwc(theirs), rtol=1e-4, atol=1e-5)


def test_upsample_nearest_matches_torch(rng):
    x = rng.standard_normal((2, 4, 3, 5)).astype(np.float32)
    ours = np.asarray(layers.upsample_nearest(jnp.asarray(x), 2))
    theirs = F.interpolate(_nchw(x), scale_factor=2, mode="nearest")
    np.testing.assert_allclose(ours, _to_nhwc(theirs))


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(layers.max_pool(jnp.asarray(x)))
    theirs = F.max_pool2d(_nchw(x), 2, 2)
    np.testing.assert_allclose(ours, _to_nhwc(theirs))


def test_instance_norm_affine_custom_vjp_matches_autodiff(rng):
    """The closed-form IN-affine backward == autodiff of the plain formula
    for every input (s, mean, inv, scale, bias), with and without ReLU,
    shared and conditional affines."""
    import jax

    s = jnp.asarray(rng.standard_normal((2, 5, 4, 3)).astype(np.float32))
    mean, inv = layers.instance_norm_stats(s)
    for relu in (False, True):
        for cond in (False, True):
            if cond:
                scale = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
                bias = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
            else:
                scale = jnp.asarray(rng.standard_normal((3,)).astype(np.float32))
                bias = jnp.asarray(rng.standard_normal((3,)).astype(np.float32))

            def naive(s, mean, inv, scale, bias, relu=relu):
                sc = scale[:, None, None, :] if scale.ndim == 2 else scale
                b = bias[:, None, None, :] if bias.ndim == 2 else bias
                out = (s.astype(jnp.float32) - mean) * inv * sc + b
                if relu:
                    out = jnp.maximum(out, 0.0)
                return out.astype(s.dtype)

            def loss_c(*args):
                return jnp.sum(
                    jnp.square(layers.instance_norm_affine(*args, relu=relu))
                )

            def loss_n(*args):
                return jnp.sum(jnp.square(naive(*args)))

            args = (s, mean, inv, scale, bias)
            gc = jax.grad(loss_c, argnums=(0, 1, 2, 3, 4))(*args)
            gn = jax.grad(loss_n, argnums=(0, 1, 2, 3, 4))(*args)
            for c, n in zip(gc, gn):
                np.testing.assert_allclose(
                    np.asarray(c), np.asarray(n), rtol=2e-5, atol=1e-5,
                    err_msg=f"relu={relu} cond={cond}",
                )
