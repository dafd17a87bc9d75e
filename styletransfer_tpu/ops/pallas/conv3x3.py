"""Pallas 3x3 VALID convolution for the residual stack.

Targets the transform net's hottest remaining ops (docs/performance.md
"Remaining hot ops"): the ten 3x3 128->128 convs of the residual blocks,
which the XLA conv emitter runs at 34-48% MXU utilization on
[B, 66, 66, 128] bf16 pre-padded inputs (the pad-early formulation,
models/transformer.py:236-246).

Kernel design (one grid step per image, Pallas auto-pipelines the
HBM->VMEM block DMAs across grid steps — double-buffered by default):

- NHWC with C=128 puts channels exactly on the 128 lanes; rows/cols are
  sublanes. Per image the padded input block is [H+2, W+2, 128] bf16
  (~1.1 MB at 64x64) + one [3*3*128, 128] weight block (295 KB), well
  under the ~16 MB VMEM budget.
- The conv is 9 shifted MXU matmuls accumulated in f32:
  ``out[HW, O] = sum_{dy,dx} X[dy:dy+H, dx:dx+W, :].reshape(HW, C) @ W[dy*3+dx]``.
  Each dot is [4096, 128] x [128, 128] — M=4096 keeps the systolic array
  streaming; the f32 accumulator lives in registers/VMEM.
- Bias add + optional ReLU fuse into the epilogue. Instance-norm statistics
  (sum and sum-of-squares per channel, f32) are emitted as extra outputs so
  the downstream IN costs one [C]-sized normalization instead of re-reading
  the [HW, C] output (XLA fuses IN stats into *its* convs; a kernel that
  dropped them would win the conv and lose the fusion).

Verification: tests/test_pallas_conv.py pins numerics against
``lax.conv_general_dilated`` on the exact model shapes. Performance:
benchmarks/pallas_conv_bench.py measures both on the TPU (the
decision record lives in docs/performance.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flat_kernel(x_ref, w_ref, b_ref, o_ref, *, H, Wp, relu):
    """Shift-slice formulation: x_ref is [1, >=H*Wp+2*Wp+4, C] — the padded
    image flattened row-major (rows of width Wp = W+2). A (dy, dx) tap of
    the conv is then a CONTIGUOUS slice at offset dy*Wp+dx: no per-tap
    reshape/relayout ever happens; the output is computed on the same
    Wp-wide grid (2 garbage columns per row) and sliced by the caller,
    where XLA fuses the slice into the consumer."""
    M = H * Wp
    acc = jnp.zeros((M, w_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            off = dy * Wp + dx
            xs = x_ref[0, off : off + M, :]
            acc = acc + jnp.dot(
                xs, w_ref[dy * 3 + dx], preferred_element_type=jnp.float32
            )
    acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.astype(o_ref.dtype)


def _im2col_kernel(x_ref, w_ref, b_ref, o_ref, xs_ref, *, H, Wp, relu):
    """Single-dot formulation: stage the [M, 9C] im2col operand in a VMEM
    scratch via 9 column-band stores of contiguous shift-slices (a giant
    vector concatenate trips a Mosaic internal error), then ONE
    [M, 9C] x [9C, O] matmul — K=9C keeps the accumulation inside the MXU
    instead of round-tripping a [M, O] f32 accumulator through VMEM nine
    times."""
    M = H * Wp
    C = x_ref.shape[-1]
    for t, (dy, dx) in enumerate(
        (dy, dx) for dy in range(3) for dx in range(3)
    ):
        off = dy * Wp + dx
        xs_ref[:, t * C : (t + 1) * C] = x_ref[0, off : off + M, :]
    acc = jnp.dot(xs_ref[:, :], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def conv3x3_im2col(
    x: jnp.ndarray,  # [B, H+2, W+2, C] (pre-padded)
    w: jnp.ndarray,  # [3, 3, C, O]
    b: jnp.ndarray,  # [O]
    relu: bool = False,
    interpret: bool = False,
):
    """Single-matmul variant of :func:`conv3x3_flat` (in-VMEM im2col)."""
    B, Hp, Wp, C = x.shape
    H, W = Hp - 2, Wp - 2
    O = w.shape[-1]
    M = H * Wp
    need = M + 2 * Wp + 2
    flat = x.reshape(B, Hp * Wp, C)
    if flat.shape[1] < need:
        flat = jnp.pad(flat, ((0, 0), (0, need - flat.shape[1]), (0, 0)))
    wk = w.reshape(9 * C, O).astype(x.dtype)
    bk = b.reshape(1, O)
    mem = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_im2col_kernel, H=H, Wp=Wp, relu=relu),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, flat.shape[1], C), lambda i: (i, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((9 * C, O), lambda i: (0, 0), memory_space=mem),
            pl.BlockSpec((1, O), lambda i: (0, 0), memory_space=mem),
        ],
        out_specs=pl.BlockSpec((1, M, O), lambda i: (i, 0, 0),
                               memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((B, M, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, 9 * C), x.dtype)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * 9 * C * O,
            bytes_accessed=flat.size * flat.dtype.itemsize
            + B * M * O * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(flat, wk, bk)
    return out.reshape(B, H, Wp, O)[:, :, :W, :]


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def conv3x3_flat(
    x: jnp.ndarray,  # [B, H+2, W+2, C] (pre-padded)
    w: jnp.ndarray,  # [3, 3, C, O]
    b: jnp.ndarray,  # [O]
    relu: bool = False,
    interpret: bool = False,
):
    """Shift-slice variant of :func:`conv3x3_valid` (no IN stats — XLA
    fuses those into the consumer of the sliced output)."""
    B, Hp, Wp, C = x.shape
    H, W = Hp - 2, Wp - 2
    O = w.shape[-1]
    M = H * Wp
    need = M + 2 * Wp + 2  # max tap offset + M
    flat = x.reshape(B, Hp * Wp, C)
    if flat.shape[1] < need:
        flat = jnp.pad(flat, ((0, 0), (0, need - flat.shape[1]), (0, 0)))
    wk = w.reshape(9, C, O).astype(x.dtype)
    bk = b.reshape(1, O)
    mem = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_flat_kernel, H=H, Wp=Wp, relu=relu),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, flat.shape[1], C), lambda i: (i, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((9, C, O), lambda i: (0, 0, 0), memory_space=mem),
            pl.BlockSpec((1, O), lambda i: (0, 0), memory_space=mem),
        ],
        out_specs=pl.BlockSpec((1, M, O), lambda i: (i, 0, 0),
                               memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((B, M, O), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * 9 * C * O,
            bytes_accessed=flat.size * flat.dtype.itemsize
            + B * M * O * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(flat, wk, bk)
    return out.reshape(B, H, Wp, O)[:, :, :W, :]


def _kernel(x_ref, w_ref, b_ref, o_ref, sum_ref, ssq_ref, *, H, W, relu):
    acc = jnp.zeros((H * W, w_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, dy : dy + H, dx : dx + W, :].reshape(H * W, -1)
            acc = acc + jnp.dot(
                xs, w_ref[dy * 3 + dx], preferred_element_type=jnp.float32
            )
    acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    sum_ref[0, 0] = jnp.sum(acc, axis=0)
    ssq_ref[0, 0] = jnp.sum(acc * acc, axis=0)
    o_ref[0] = acc.reshape(H, W, -1).astype(o_ref.dtype)


def conv3x3_valid(
    x: jnp.ndarray,  # [B, H+2, W+2, C] (pre-padded)
    w: jnp.ndarray,  # [3, 3, C, O]
    b: jnp.ndarray,  # [O]
    relu: bool = False,
    interpret: bool = False,
):
    """VALID 3x3 conv + bias (+ReLU) with per-image IN statistics.

    Returns ``(out [B,H,W,O], sums [B,O], sumsqs [B,O])`` — the sums are of
    the *post-activation* output, f32, ready for instance-norm
    (mean = sums/(H*W), var = sumsqs/(H*W) - mean^2).
    """
    out, s, ss = _call(x, w, b, relu=relu, interpret=interpret)
    return out, s[:, 0], ss[:, 0]


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def _call(x, w, b, relu: bool, interpret: bool):
    B, Hp, Wp, C = x.shape
    H, W = Hp - 2, Wp - 2
    O = w.shape[-1]
    wk = w.reshape(9, C, O).astype(x.dtype)
    bk = b.reshape(1, O)

    kern = functools.partial(_kernel, H=H, W=W, relu=relu)
    flops = 2 * B * H * W * 9 * C * O
    mem = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, C), lambda i: (i, 0, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((9, C, O), lambda i: (0, 0, 0),
                         memory_space=mem),
            pl.BlockSpec((1, O), lambda i: (0, 0), memory_space=mem),
        ],
        out_specs=(
            pl.BlockSpec((1, H, W, O), lambda i: (i, 0, 0, 0),
                         memory_space=mem),
            # Stats blocks carry a singleton middle dim so the last-two
            # block dims equal the array dims (TPU block tiling rule).
            pl.BlockSpec((1, 1, O), lambda i: (i, 0, 0), memory_space=mem),
            pl.BlockSpec((1, 1, O), lambda i: (i, 0, 0), memory_space=mem),
        ),
        interpret=interpret,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, O), x.dtype),
            jax.ShapeDtypeStruct((B, 1, O), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, O), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + B * H * W * O * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, wk, bk)
