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

import functools

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflection-pad spatial dims of an NHWC tensor by ``pad`` on each side."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def edge_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Edge (replicate) padding of spatial dims.

    This is the small-grid equivalent of reflection padding applied *after*
    a 2x nearest upsample: with u = upsample2(s), the reflected border
    u'[-1] = u[1] = s[0] — the edge pixel of s, not its reflection. Used by
    the phase-form upsample+conv path (:func:`upsample_phase_kernel`).
    """
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    reflect: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
    valid: bool = False,
) -> jnp.ndarray:
    """2-D convolution with reflection padding of k//2 (torch 'same'-ish).

    ``x``: [N, H, W, Cin]; ``kernel``: [kh, kw, Cin, Cout]; returns NHWC.
    Accumulation is always float32 (``preferred_element_type``) so bfloat16
    inputs ride the MXU without precision collapse.

    ``valid=True`` applies no padding at all — for callers whose input is
    already padded (the pad-early formulation in models/transformer.py,
    where the previous op wrote its output pre-padded for this conv).
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    pad = kh // 2
    assert kh == kw, "square kernels only"
    if valid:
        padding = "VALID"
    elif reflect:
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


def instance_norm_stats(
    x: jnp.ndarray, eps: float = 1e-5, one_pass: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(sample, channel) ``(mean, rsqrt(var+eps))``.

    ``one_pass=True`` (default) computes E[x^2]-E[x]^2 from ONE fused read
    of x (both sums share a multi-output reduce fusion) — the textbook
    two-pass reads the activation twice, and on a bandwidth-bound chip the
    extra pass is the single biggest cost in the transform net (measured:
    one-pass lifts end-to-end inference 2090 -> 2615 img/s bf16 at b128).

    Numerical contract: f32 accumulation makes the cancellation error of
    the one-pass variance ~1e-7 x (1 + mean^2/var); for instance-norm
    activations (mean/std <= ~30 in practice) that is <= ~1e-4 relative —
    measured 2.8e-6 end-to-end difference vs two-pass through the whole
    16-IN network. A shifted estimator would bound pathological inputs too,
    but its shift value data-depends on x and breaks the single-fusion
    property (measured +73 MB/img). The variance is clamped at 0 so
    pathological cancellation can never produce a NaN from rsqrt.
    ``one_pass=False`` selects the exact centered two-pass.
    """
    x32 = x.astype(jnp.float32)
    n = x.shape[1] * x.shape[2]
    if one_pass:
        s = jnp.sum(x32, axis=(1, 2), keepdims=True)
        sq = jnp.sum(x32 * x32, axis=(1, 2), keepdims=True)
        mean = s / n
        var = jnp.maximum(sq / n - mean * mean, 0.0)
    else:
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    return mean, jax.lax.rsqrt(var + eps)


def _in_affine_impl(relu, s, mean, inv, scale, bias):
    if scale.ndim == 2:  # conditional [B, C] affines (multi-style)
        scale = scale[:, None, None, :]
        bias = bias[:, None, None, :]
    out = (s.astype(jnp.float32) - mean) * inv * scale + bias
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(s.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _in_affine(relu, s, mean, inv, scale, bias):
    return _in_affine_impl(relu, s, mean, inv, scale, bias)


def _in_affine_fwd(relu, s, mean, inv, scale, bias):
    return _in_affine_impl(relu, s, mean, inv, scale, bias), (
        s, mean, inv, scale, bias,
    )


def _in_affine_bwd(relu, res, g):
    # Closed-form backward sharing ONE fused read for both channel sums.
    # Autodiff of the f32 epilogue materializes a full-size f32 convert of
    # the incoming cotangent (it has several consumers) plus per-term
    # reductions — measured ~4.7 ms/step at b128. Here everything reduces
    # to S1 = Σ_{hw} gm and S2 = Σ_{hw} gm·x̂ (f32 accumulation), and the
    # full-size input cotangent is written directly in s.dtype:
    #   ds      = gm · inv·scale
    #   d_mean  = -inv·scale · S1          d_inv = scale/inv · S2
    #   d_scale = Σ_b S2 (or S2)           d_bias = Σ_b S1 (or S1)
    s, mean, inv, scale, bias = res
    cond = scale.ndim == 2
    scale_b = scale[:, None, None, :] if cond else scale
    bias_b = bias[:, None, None, :] if cond else bias
    s32 = s.astype(jnp.float32)
    xhat = (s32 - mean) * inv
    if relu:
        pre = xhat * scale_b + bias_b
        gm = jnp.where(pre > 0, g, jnp.zeros((), g.dtype))
    else:
        gm = g
    gm32 = gm.astype(jnp.float32)
    s1 = jnp.sum(gm32, axis=(1, 2), keepdims=True)          # [B,1,1,C]
    s2 = jnp.sum(gm32 * xhat, axis=(1, 2), keepdims=True)   # [B,1,1,C]
    ds = (gm32 * (inv * scale_b)).astype(s.dtype)
    d_mean = (-(inv * scale_b) * s1).astype(mean.dtype)
    d_inv = (scale_b / inv * s2).astype(inv.dtype)
    if cond:
        d_scale = s2[:, 0, 0, :].astype(scale.dtype)
        d_bias = s1[:, 0, 0, :].astype(bias.dtype)
    else:
        d_scale = jnp.sum(s2, axis=(0, 1, 2)).astype(scale.dtype)
        d_bias = jnp.sum(s1, axis=(0, 1, 2)).astype(bias.dtype)
    return ds, d_mean, d_inv, d_scale, d_bias


_in_affine.defvjp(_in_affine_fwd, _in_affine_bwd)


def instance_norm_affine(
    s: jnp.ndarray,
    mean: jnp.ndarray,
    inv: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    relu: bool = False,
) -> jnp.ndarray:
    """Apply the IN affine (given precomputed stats) + optional ReLU.

    ``s`` may be a spatially PADDED view of the tensor the stats came from
    — normalization is pointwise given stats, so it commutes exactly with
    reflection padding (the pad-early trick: XLA fuses the pad into this
    elementwise epilogue, so the padded tensor is written once instead of
    normalize-write + pad-rewrite).

    Carries a custom VJP (see ``_in_affine_bwd``): the closed-form backward
    needs two shared channel sums and writes the input cotangent in
    ``s.dtype`` directly, instead of autodiff's materialized full-size f32
    cotangent convert.
    """
    return _in_affine(bool(relu), s, mean, inv, scale, bias)


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor upsample of NHWC by an integer factor.

    Equivalent to ``nn.Upsample(mode='nearest', scale_factor=factor)``.
    Implemented with repeat so XLA lowers it to a cheap broadcast-reshape.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


def space_to_depth(x: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/b, W/b, b*b*C] (phase-major channel order)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // block, w // block, block * block * c
    )


def depth_to_space(y: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, h, w, cbb = y.shape
    c = cbb // (block * block)
    y = y.reshape(b, h, w, block, block, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * block, w * block, c)


def phase_conv_kernel(kernel: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """Rearrange a [K, K, C, O] stride-1 conv kernel into its space-to-depth
    phase form [K', K', block^2*C, block^2*O] with K' = 2*(K//2)//block + 1.

    A 9x9 conv with 3 or 32 channels uses ~2% of the MXU's 128-wide output
    tile; the same conv over 4x4 space-to-depth input is a 3x3 conv with
    16x the channels — dense MXU shapes. Measured (v5e, b128 bf16, the
    transform net's final 9x9 32->3): 9.1 ms -> 4.3 ms including both
    relayouts. The phase kernel is a pure gather of the original weights
    (zeros where a phase's tap falls outside the 9x9 window), so gradients
    flow through for training.

    Derivation: out[bY+py, bX+px, o] = sum x[bY+py+dy-r, bX+px+dx-r, c]
    * K[dy,dx,c,o] with r = K//2; writing the source row as b(Y+sy)+qy
    gives dy = b*sy + qy - py + r.
    """
    k, _, c, o = kernel.shape
    r = k // 2
    # The span = r // block derivation below requires block | r; an
    # invalid combo (e.g. 5x5 with block=4) would silently drop
    # cross-block taps and produce a wrong-shaped, numerically
    # meaningless kernel (upsample_phase_kernel asserts its own 3x3
    # precondition the same way).
    assert r % block == 0, (
        f"phase_conv_kernel requires block ({block}) to divide "
        f"kernel_size//2 ({r}); got a {k}x{k} kernel"
    )
    span = r // block  # s ranges over [-span, span]
    ks = 2 * span + 1
    # Static gather maps (numpy): indices into a zero-padded kernel.
    dy = np.zeros((ks, ks, block, block, block, block), np.int32)
    dx = np.zeros_like(dy)
    for syi, sy in enumerate(range(-span, span + 1)):
        for sxi, sx in enumerate(range(-span, span + 1)):
            for qy in range(block):
                for qx in range(block):
                    for py in range(block):
                        for px in range(block):
                            y_ = block * sy + qy - py + r
                            x_ = block * sx + qx - px + r
                            dy[syi, sxi, qy, qx, py, px] = y_ if 0 <= y_ < k else k
                            dx[syi, sxi, qy, qx, py, px] = x_ if 0 <= x_ < k else k
    kpad = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # row/col k = zeros
    g = kpad[dy, dx]  # [ks, ks, b, b, b, b, C, O]
    bb = block * block
    return g.transpose(0, 1, 2, 3, 6, 4, 5, 7).reshape(ks, ks, bb * c, bb * o)


# Tap-membership matrix for the 2x-upsample phase decomposition:
# _UP_COMBOS[p][t][d] == 1 iff original kernel tap d contributes to phase p's
# 2-tap kernel position t. Derivation: with u = upsample2(s),
#   out[2Y+0] = K0*s[Y-1] + (K1+K2)*s[Y]      (taps u[2Y-1], u[2Y], u[2Y+1])
#   out[2Y+1] = (K0+K1)*s[Y] + K2*s[Y+1]      (taps u[2Y], u[2Y+1], u[2Y+2])
_UP_COMBOS = np.array(
    [[[1, 0, 0], [0, 1, 1]], [[1, 1, 0], [0, 0, 1]]], np.float32
)  # [phase, t, d]


def upsample_phase_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a [3, 3, C, O] conv kernel so that a single VALID conv on the
    SMALL grid computes ``nearest-upsample x2 -> reflect-pad 1 -> conv3x3``
    in 2x2 space-to-depth phase form.

    ``conv(edge_pad(s, 1), upsample_phase_kernel(K), VALID)`` equals
    ``space_to_depth(conv3x3(reflect_pad(upsample2(s), 1), K), 2)`` exactly
    (channel order (py, px, o)) — the regrouped sums are identical in exact
    arithmetic.

    Why: the reference's decoder (network.py:576-601) upsamples then
    convolves; on TPU that materializes a 4x-sized broadcast and runs the
    conv at 4x the spatial positions with 9 taps over duplicated pixels. In
    phase form the conv runs on the small grid with a dense contraction
    (9*C) and 4*O output channels — dense MXU shapes, no broadcast. Note
    the boundary: reflection padding applied to the *upsampled* grid reads
    the edge pixel of the small grid (u[-1] = u[1] = s[0]), i.e. EDGE
    padding of ``s`` (:func:`edge_pad`), not reflection.

    Each phase's true support is 2x2; it is placed at offset (py, px)
    inside the 3x3 kernel (zeros elsewhere) so all four phases share one
    conv. That spends the same MACs as the naive upsampled conv (9 taps x
    1/4 positions x 4 phases, the zero taps are not skipped) but at much
    higher MXU utilization; four separate 2x2 convs (one per phase) would
    spend 4/9 the MACs but quadruple the input reads and halve the output
    lane fill.
    """
    k, k2, c, o = kernel.shape
    assert k == 3 and k2 == 3, "upsample_phase_kernel is for 3x3 kernels"
    m = jnp.asarray(_UP_COMBOS, kernel.dtype)
    # kp[py, px, ty, tx, c, o] = sum_{dy,dx} M[py,ty,dy] M[px,tx,dx] K[dy,dx,c,o]
    kp = jnp.einsum("ptd,qse,deco->pqtsco", m, m, kernel)
    blocks = []
    for py in range(2):
        row = []
        for px in range(2):
            row.append(
                jnp.pad(kp[py, px], ((py, 1 - py), (px, 1 - px), (0, 0), (0, 0)))
            )
        blocks.append(jnp.stack(row, axis=3))  # [3,3,C,2(px),O]
    k3 = jnp.stack(blocks, axis=3)  # [3,3,C,2(py),2(px),O]
    return k3.reshape(3, 3, c, 4 * o)


def instance_norm_stats_phased(
    x: jnp.ndarray, phases: int = 4, eps: float = 1e-5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Instance-norm stats of a phase-form tensor [B, h, w, phases*C]
    (channel order (phase, c)): per-(sample, c) ``(mean, rsqrt(var+eps))``
    pooled over space AND phases — exactly the stats of the
    depth_to_space-reassembled tensor. Returns [B, C] arrays (one-pass
    estimator; see :func:`instance_norm_stats` for the numerics contract).
    """
    x32 = x.astype(jnp.float32)
    b, h, w, c4 = x.shape
    c = c4 // phases
    n = h * w * phases
    s = jnp.sum(x32, axis=(1, 2)).reshape(b, phases, c).sum(axis=1)
    sq = jnp.sum(x32 * x32, axis=(1, 2)).reshape(b, phases, c).sum(axis=1)
    mean = s / n
    var = jnp.maximum(sq / n - mean * mean, 0.0)
    return mean, jax.lax.rsqrt(var + eps)


def max_pool(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """Max pooling (VGG's ``nn.MaxPool2d(2, 2)``) on NHWC.

    (A reshape + max-reduce form of the 2x2 case — same forward, eq-mask
    backward instead of select_and_scatter — was measured SLOWER end to end
    in the b128 train step, 462 vs 478 img/s; reduce_window stays.)
    """
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
