"""Fused instance-norm (+ReLU) (+residual-add) as a Pallas TPU kernel.

The transform nets apply InstanceNorm after every conv (network.py:520-611).
XLA lowers IN as reduce (stats) + map (normalize) — multiple HBM passes over
each activation map. This kernel does one pass per sample: read the
activation into VMEM once, compute per-channel statistics, normalize, apply
the optional residual add (post-add IN, network.py:502-504) and ReLU, and
write once.

Lane packing: a naive ``[1, H, W, C]`` block puts C in the lane dimension;
with C in {32, 64} Mosaic pads lanes to 128, wasting 2-4x VMEM (observed:
64 MB windows for 8 MB of data -> VMEM OOM). Instead the wrapper views the
NHWC array as ``[N, H, W*C]`` — a free view in row-major layout — so lanes
are fully packed (every transform-net layer has W*C a multiple of 128).
Channel statistics are then computed with a small iota-built selection
matrix M[W*C, C] (M[l, c] = 1 iff l mod C == c): per-channel sums are
``row_sums @ M`` (one tiny MXU matmul) and per-lane broadcasts are
``M @ stat``.

The backward pass falls back to the XLA reference implementation via
``jax.custom_vjp`` — the backward is matmul-free elementwise work XLA fuses
well on its own.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_reference(x, scale, bias, residual=None, relu=False, eps=1e-5):
    """Pure-XLA semantics the kernel must match (and the VJP source).

    ``scale``/``bias`` may be [C] (shared) or [B, C] (conditional affine,
    the multi-style path — models/multistyle.py)."""
    x32 = x.astype(jnp.float32)
    if residual is not None:
        x32 = x32 + residual.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    if scale.ndim == 2:
        scale = scale[:, None, None, :]
        bias = bias[:, None, None, :]
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype)


def _kernel(x_ref, scale_ref, bias_ref, out_ref, *, relu: bool, eps: float,
            c: int, res_ref=None):
    # Refs are [1, H, W*C] lane-packed blocks (one sample per grid step).
    x = x_ref[0].astype(jnp.float32)  # [H, WC]
    if res_ref is not None:
        x = x + res_ref[0].astype(jnp.float32)
    h, wc = x.shape
    n_spatial = h * (wc // c)

    # Channel-selection matrix M[WC, C]: lane l belongs to channel l % C.
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (wc, c), 0)
    chan_ids = jax.lax.broadcasted_iota(jnp.int32, (wc, c), 1)
    m = (lane_ids % c == chan_ids).astype(jnp.float32)  # [WC, C]

    # Per-lane sums over H, folded to per-channel sums via M (MXU).
    lane_sum = jnp.sum(x, axis=0, keepdims=True)          # [1, WC]
    chan_sum = jnp.dot(lane_sum, m, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)    # [1, C]
    mean = chan_sum / n_spatial                           # [1, C]

    # Two-pass (centered) variance: x is already VMEM-resident so the second
    # pass is register-rate, and it avoids the E[x^2]-E[x]^2 cancellation
    # (which cost ~3e-3 relative error on typical activations).
    mean_lane = jnp.dot(mean, m.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)     # [1, WC]
    centered = x - mean_lane
    lane_sumsq = jnp.sum(centered * centered, axis=0, keepdims=True)
    var = jnp.dot(lane_sumsq, m, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST) / n_spatial
    inv = jax.lax.rsqrt(var + eps)

    # Broadcast per-channel stats (and affine params) back to lanes via M.
    g = scale_ref[...].astype(jnp.float32).reshape(1, c)
    b = bias_ref[...].astype(jnp.float32).reshape(1, c)
    # out = (x - mean) * inv * g + b, expressed per-lane:
    #     = x * a_lane + b_lane,  a = inv*g,  b = b - mean*inv*g
    a_lane = jnp.dot(inv * g, m.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)     # [1, WC]
    b_lane = jnp.dot(b - mean * inv * g, m.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)

    out = x * a_lane + b_lane
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0] = out.astype(out_ref.dtype)


def _kernel_with_res(x_ref, res_ref, scale_ref, bias_ref, out_ref, *, relu, eps, c):
    _kernel(x_ref, scale_ref, bias_ref, out_ref, relu=relu, eps=eps, c=c,
            res_ref=res_ref)


def pallas_supported(shape) -> bool:
    """Lane-packed kernel needs W*C % 128 == 0 and H % 8 == 0."""
    _, h, w, c = shape
    return (w * c) % 128 == 0 and h % 8 == 0


def _pallas_forward(x, scale, bias, residual, relu: bool, eps: float,
                    interpret: bool = False):
    n, h, w, c = x.shape
    wc = w * c
    x2 = x.reshape(n, h, wc)  # free view in row-major NHWC
    mem = pl.ANY if interpret else pltpu.VMEM
    block = pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0), memory_space=mem)
    chan = pl.BlockSpec((c,), lambda i: (0,), memory_space=mem)
    if residual is None:
        kernel = functools.partial(_kernel, relu=relu, eps=eps, c=c)
        in_specs = [block, chan, chan]
        args = (x2, scale, bias)
    else:
        kernel = functools.partial(_kernel_with_res, relu=relu, eps=eps, c=c)
        in_specs = [block, block, chan, chan]
        args = (x2, residual.reshape(n, h, wc), scale, bias)
    kwargs = {}
    if not interpret:
        # Blocks are up to 8 MB (f32 [1, 256, 8192]); with double-buffered
        # input(s) + output the default 16 MB scoped-VMEM limit is too small.
        # v5e has 128 MB of VMEM; allow the largest residual case:
        # (in + res + out) * 2 buffers * 8 MB = 48 MB, plus scratch headroom.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
        **kwargs,
    )(*args)
    return out.reshape(n, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused(x, scale, bias, residual, relu, eps, interpret):
    return _pallas_forward(x, scale, bias, residual, relu, eps, interpret)


def _fused_fwd(x, scale, bias, residual, relu, eps, interpret):
    out = _pallas_forward(x, scale, bias, residual, relu, eps, interpret)
    return out, (x, scale, bias, residual)


def _fused_bwd(relu, eps, interpret, res, g):
    x, scale, bias, residual = res
    if residual is None:
        def f(x_, s_, b_):
            return _xla_reference(x_, s_, b_, None, relu, eps)

        _, vjp = jax.vjp(f, x, scale, bias)
        dx, dscale, dbias = vjp(g)
        return dx, dscale, dbias, None
    def f(x_, s_, b_, r_):
        return _xla_reference(x_, s_, b_, r_, relu, eps)

    _, vjp = jax.vjp(f, x, scale, bias, residual)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def _kernel_padded(x_ref, scale_ref, bias_ref, out_ref, *, relu, eps, c, pad,
                   res_ref=None, res_pad=0):
    """IN(+res)(+ReLU) writing the output WITH the next conv's reflection
    padding — the deeper fusion the round-1 roadmap called for. One HBM
    read + one padded write per sample; exact two-pass variance in VMEM."""
    x = x_ref[0].astype(jnp.float32)  # [H, W*C] lane-packed
    if res_ref is not None:
        r = res_ref[0].astype(jnp.float32)
        if res_pad:
            hr, wcr = r.shape
            r = jax.lax.slice(r, (res_pad, res_pad * c),
                              (hr - res_pad, wcr - res_pad * c))
        x = x + r
    h, wc = x.shape
    n_spatial = h * (wc // c)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (wc, c), 0)
    chan_ids = jax.lax.broadcasted_iota(jnp.int32, (wc, c), 1)
    m = (lane_ids % c == chan_ids).astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    lane_sum = jnp.sum(x, axis=0, keepdims=True)
    mean = jnp.dot(lane_sum, m, preferred_element_type=jnp.float32,
                   precision=hi) / n_spatial
    centered = x - jnp.dot(mean, m.T, preferred_element_type=jnp.float32,
                           precision=hi)
    lane_sumsq = jnp.sum(centered * centered, axis=0, keepdims=True)
    var = jnp.dot(lane_sumsq, m, preferred_element_type=jnp.float32,
                  precision=hi) / n_spatial
    inv = jax.lax.rsqrt(var + eps)
    g = scale_ref[...].astype(jnp.float32).reshape(1, c)
    b = bias_ref[...].astype(jnp.float32).reshape(1, c)
    a_lane = jnp.dot(inv * g, m.T, preferred_element_type=jnp.float32,
                     precision=hi)
    b_lane = jnp.dot(b - mean * inv * g, m.T,
                     preferred_element_type=jnp.float32, precision=hi)
    out = x * a_lane + b_lane
    if relu:
        out = jnp.maximum(out, 0.0)
    if pad:
        # Width reflection (padded col -j = col j); then height, built from
        # single-row slices (Mosaic has no `rev`; pad <= 4 keeps this tiny).
        w = wc // c
        left = [out[:, (j + 1) * c:(j + 2) * c] for j in reversed(range(pad))]
        right = [out[:, (w - 2 - j) * c:(w - 1 - j) * c] for j in range(pad)]
        out = jnp.concatenate(left + [out] + right, axis=1)
        top = [out[i:i + 1] for i in range(pad, 0, -1)]
        bot = [out[h - 2 - i:h - 1 - i] for i in range(pad)]
        out = jnp.concatenate(top + [out] + bot, axis=0)
    out_ref[0] = out.astype(out_ref.dtype)


def fused_instance_norm_padded(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    residual: Optional[jnp.ndarray] = None,
    relu: bool = False,
    pad: int = 0,
    res_is_padded: int = 0,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas IN(+res)(+ReLU) emitting a reflection-PADDED output.

    ``residual`` may itself be a padded tensor from a previous call
    (``res_is_padded`` = its pad); the kernel slices the interior in VMEM.
    Returns ``[N, H+2p, W+2p, C]``.

    Status (measured, docs/performance.md): beats XLA's naive
    stats+normalize+pad stack (7.6 vs 9.1 ms on the 256²×32 IN at b128
    bf16) but loses to the shipped pure-XLA pad-early formulation, which
    expresses the same fusion via pad-before-normalize. Kept as the
    validated native-tier implementation and for shapes/backends where the
    XLA form regresses. Forward-only (no custom VJP) — inference use.
    """
    n, h, w, c = x.shape
    x2 = x.reshape(n, h, w * c)
    out_h, out_wc = h + 2 * pad, (w + 2 * pad) * c
    mem = pl.ANY if interpret else pltpu.VMEM
    block_in = pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0), memory_space=mem)
    chan = pl.BlockSpec((c,), lambda i: (0,), memory_space=mem)
    block_out = pl.BlockSpec((1, out_h, out_wc), lambda i: (i, 0, 0),
                             memory_space=mem)
    args = [x2]
    in_specs = [block_in]
    if residual is not None:
        rn, rh, rw, rc = residual.shape
        args.append(residual.reshape(rn, rh, rw * rc))
        in_specs.append(pl.BlockSpec((1, rh, rw * rc), lambda i: (i, 0, 0),
                                     memory_space=mem))
    args += [scale, bias]
    in_specs += [chan, chan]

    if residual is None:
        kernel = functools.partial(_kernel_padded, relu=relu, eps=eps, c=c, pad=pad)
    else:
        def kernel(x_ref, res_ref, scale_ref, bias_ref, out_ref):
            _kernel_padded(x_ref, scale_ref, bias_ref, out_ref, relu=relu,
                           eps=eps, c=c, pad=pad, res_ref=res_ref,
                           res_pad=res_is_padded)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=block_out,
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_wc), x.dtype),
        interpret=interpret,
        **kwargs,
    )(*args)
    return out.reshape(n, out_h, w + 2 * pad, c)


def fused_instance_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    residual: Optional[jnp.ndarray] = None,
    relu: bool = False,
    eps: float = 1e-5,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Instance norm with optional pre-norm residual add and post-norm ReLU.

    Semantics match ``nn.InstanceNorm2d(C, affine=True)`` applied to
    ``x + residual`` followed by ReLU when the flags are set.

    Default is the XLA implementation: measured on TPU v5e at 256px, XLA's
    own fusion of the reduce+map (including fusing the normalize into
    neighboring ops) outperforms this kernel (f32: 1126 vs 848 img/s;
    bf16: 1406 vs 1164 img/s end-to-end) — a per-sample grid serializes
    DMA that XLA pipelines better. The kernel stays available via
    ``use_pallas=True`` as the substrate for deeper fusion (pad-into-conv)
    where XLA cannot follow.
    """
    if use_pallas is None:
        use_pallas = False
    # Conditional [B, C] affines (the multi-style path) are XLA-only: the
    # kernel's channel BlockSpec assumes rank-1 scale/bias, so dispatching a
    # rank-2 affine to Pallas would fail at trace time.
    if not use_pallas or not pallas_supported(x.shape) or scale.ndim == 2:
        return _xla_reference(x, scale, bias, residual, relu, eps)
    return _fused(x, scale, bias, residual, relu, eps, False)
