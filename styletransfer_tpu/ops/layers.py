"""Core neural-net building blocks as pure JAX functions (NHWC).

TPU-native equivalents of the torch layers the reference composes its models
from (``stransfer/network.py:461-611``): reflection-padded convolution,
affine instance normalization, and nearest-neighbor upsampling. Everything
here is a pure function of (params, inputs) so it jits, vmaps, shards and
differentiates freely; parameters are plain pytrees.

Parity notes vs. torch:
- ``nn.Conv2d(padding=k//2, padding_mode='reflection')`` == reflect-pad by
  k//2 then VALID conv. jnp.pad(mode='reflect') matches torch's reflection
  padding (edge pixel not repeated).
- ``nn.InstanceNorm2d(affine=True)`` uses eps=1e-5, biased variance, and
  normalizes per (sample, channel) over spatial dims at train *and* eval time
  (track_running_stats=False default).
- ``nn.Upsample(mode='nearest', scale_factor=2)`` == repeat each pixel 2x2.

Weight layout is HWIO (TPU/XLA-native); the torch OIHW layout is converted at
checkpoint-import time (:mod:`styletransfer_tpu.ckpt`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflection-pad spatial dims of an NHWC tensor by ``pad`` on each side."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    reflect: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """2-D convolution with reflection padding of k//2 (torch 'same'-ish).

    ``x``: [N, H, W, Cin]; ``kernel``: [kh, kw, Cin, Cout]; returns NHWC.
    Accumulation is always float32 (``preferred_element_type``) so bfloat16
    inputs ride the MXU without precision collapse.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    pad = kh // 2
    assert kh == kw, "square kernels only"
    if reflect:
        x = reflect_pad(x, pad)
        padding = "VALID"
    else:
        padding = [(pad, pad), (pad, pad)]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    # With a compute dtype the conv outputs in that dtype (keeping
    # activations bf16 between ops halves HBM traffic, the real bound);
    # the MXU still accumulates partial products in float32 internally.
    # Emitting f32 from bf16 operands via preferred_element_type breaks the
    # conv VJP under jax 0.9 (f32 cotangent x bf16 kernel dtype mismatch).
    pet = jnp.float32 if compute_dtype is None else compute_dtype
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=pet,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def instance_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Affine instance normalization over spatial dims of NHWC input.

    Matches ``nn.InstanceNorm2d(C, affine=True)``: per-sample, per-channel
    mean/var (biased) over H*W, then scale/shift. ``scale``/``bias`` may be
    ``[C]`` (shared affine) or ``[B, C]`` (conditional/per-sample affine, the
    multi-style "conditional instance normalization" of Dumoulin et al.).
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    if scale.ndim == 2:  # [B, C] -> broadcast over H, W
        scale = scale[:, None, None, :]
        bias = bias[:, None, None, :]
    out = (x32 - mean) * inv * scale + bias
    return out.astype(x.dtype)


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor upsample of NHWC by an integer factor.

    Equivalent to ``nn.Upsample(mode='nearest', scale_factor=factor)``.
    Implemented with repeat so XLA lowers it to a cheap broadcast-reshape.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


def max_pool(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """Max pooling (VGG's ``nn.MaxPool2d(2, 2)``) on NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


# ---------------------------------------------------------------------------
# Parameter initializers (torch-matching fan-in uniform, for training from
# scratch; deterministic given the PRNG key).
# ---------------------------------------------------------------------------


def init_conv(
    key: jax.Array,
    kh: int,
    kw: int,
    cin: int,
    cout: int,
    dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kaiming-uniform conv init matching torch ``nn.Conv2d`` defaults.

    torch draws W, b ~ U(-bound, bound) with bound = 1/sqrt(fan_in * ...)
    (kaiming_uniform with a=sqrt(5) reduces to bound = sqrt(1/fan_in) for W
    up to the gain; we use the same effective bound).
    """
    k_w, k_b = jax.random.split(key)
    fan_in = kh * kw * cin
    bound = 1.0 / jnp.sqrt(fan_in)
    kernel = jax.random.uniform(k_w, (kh, kw, cin, cout), dtype, -bound, bound)
    bias = jax.random.uniform(k_b, (cout,), dtype, -bound, bound)
    return kernel, bias


def init_instance_norm(c: int, dtype: jnp.dtype = jnp.float32):
    """torch ``nn.InstanceNorm2d(affine=True)`` init: scale=1, bias=0."""
    return jnp.ones((c,), dtype), jnp.zeros((c,), dtype)
