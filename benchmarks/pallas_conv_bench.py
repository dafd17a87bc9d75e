"""Pallas vs XLA-emitter 3x3 conv on the residual-stack shape.

The decision benchmark for ROADMAP's "manual-DMA Pallas conv" candidate:
[B, 66, 66, 128] bf16 pre-padded input -> VALID 3x3 conv 128->128
(the shape the five residual blocks run ten times per forward at 256px).

Timing: chained executions ending in a scalar readback (block_until_ready
does not synchronize on the tunneled axon backend).

Run on TPU: ``python benchmarks/pallas_conv_bench.py``
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from styletransfer_tpu.ops.pallas.conv3x3 import (
    conv3x3_flat, conv3x3_im2col, conv3x3_valid,
)

B, H, W, C, O = 128, 64, 64, 128, 128
ITERS = 20


@jax.jit
def xla_conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out + b
    # The model's IN needs per-image channel stats; XLA fuses these into
    # the conv epilogue, so charge them to the XLA side too.
    s = jnp.sum(out.astype(jnp.float32), axis=(1, 2))
    ss = jnp.sum(jnp.square(out.astype(jnp.float32)), axis=(1, 2))
    return out, s, ss


def timed(fn, args, label):
    out = fn(*args)
    float(jnp.sum(out[0].astype(jnp.float32)))  # compile + settle
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        float(jnp.sum(out[0].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    gf = 2 * B * H * W * 9 * C * O / 1e9
    print(f"{label}: {best * 1000:.3f} ms  ({gf / best / 1000:.1f} TF/s)")
    return best


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H + 2, W + 2, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C, O)) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(O), jnp.float32)

    # numerics check first
    ours = conv3x3_valid(x, w, b)
    ref = xla_conv(x, w.astype(jnp.bfloat16), b.astype(x.dtype))
    d = np.abs(np.asarray(ours[0], np.float32) - np.asarray(ref[0], np.float32))
    rel = d.max() / max(1e-6, float(np.abs(np.asarray(ref[0], np.float32)).max()))
    print(f"max rel diff vs XLA conv: {rel:.2e}")

    @jax.jit
    def xla_conv_nostats(x, w, b):
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return (out + b,)

    t_xla = timed(xla_conv, (x, w, b.astype(x.dtype)), "xla conv+stats    ")
    t_xla_ns = timed(
        xla_conv_nostats, (x, w, b.astype(x.dtype)), "xla conv (no stats)"
    )
    t_pl = timed(conv3x3_valid, (x, w, b), "pallas conv+stats  ")
    t_fl = timed(
        lambda x, w, b: (conv3x3_flat(x, w, b),), (x, w, b),
        "pallas shift-slice ",
    )
    t_i2c = timed(
        lambda x, w, b: (conv3x3_im2col(x, w, b),), (x, w, b),
        "pallas im2col 1-dot",
    )
    print(f"pallas im2col vs xla no-stats: {t_xla_ns / t_i2c:.2f}x")
    print(f"pallas+stats vs xla+stats: {t_xla / t_pl:.2f}x")
    print(f"pallas shift-slice vs xla no-stats: {t_xla_ns / t_fl:.2f}x")


if __name__ == "__main__":
    main()
