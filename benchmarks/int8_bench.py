"""Is an int8 quantized serving tier worth building on this TPU?

Measures XLA's int8 (s8 x s8 -> s32) matmul/conv throughput against bf16
at (a) large square matmuls, where the MXU's double-rate int8 path shows
its peak, and (b) the exact shape of the fast_st residual-block conv —
the hottest op of the serving forward (docs/performance.md).

Measured 2026-08-17 (TPU v5 lite, tunneled backend; min-of-7 reps —
single-rep timings swing 2x under tunnel contention):

  matmul 4096^3        bf16  69.0 TF/s   int8  72.2 TOP/s   (1.05x)
  matmul 8192^3        bf16 124.2 TF/s   int8 200.9 TOP/s   (1.6x)
  conv 3x3 C128 b128   bf16  64.8 TF/s   int8  63.9 TOP/s   (0.99x)
  quant+conv+dequant b128 (the realistic serving block)      (0.86x)

Conclusion (recorded in docs/performance.md): the int8 double-rate MXU
path only materializes at contraction/output dims far larger than this
model ever reaches (C<=128 => K=9*128=1152). At the shipped serving
batch (b128, where bf16 reaches ~65 TF/s on this conv) int8 TIES the
bf16 emitter, and the unavoidable per-layer activation quantize (IN
re-normalizes every layer, so scales cannot be folded into weights)
turns the tier into a net 14% LOSS. Rejected; revisit only for models
with >=512-channel convs.
"""

from __future__ import annotations

import time

import numpy as np


def _timeit(f, *args, n=20, reps=7):
    """Min-of-``reps`` timing: the tunneled backend shows 2x run-to-run
    swings under contention; the minimum is the reproducible number."""
    import jax.numpy as jnp

    r = f(*args)
    float(jnp.sum(r.astype(jnp.float32)))  # sync (axon ignores block_until_ready)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        float(jnp.sum(r.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("device:", jax.devices()[0].device_kind)
    k = jax.random.PRNGKey(0)

    for M in (4096, 8192):
        a_bf = jax.random.normal(k, (M, M), jnp.bfloat16)
        b_bf = jax.random.normal(k, (M, M), jnp.bfloat16)
        a_i8 = jnp.asarray(np.random.randint(-127, 127, (M, M), np.int8))
        b_i8 = jnp.asarray(np.random.randint(-127, 127, (M, M), np.int8))
        mm_bf = jax.jit(lambda a, b: a @ b)
        mm_i8 = jax.jit(
            lambda a, b: lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        )
        t_bf = _timeit(mm_bf, a_bf, b_bf, n=10)
        t_i8 = _timeit(mm_i8, a_i8, b_i8, n=10)
        fl = 2 * M ** 3
        print(
            f"matmul {M}^3  bf16 {fl / t_bf / 1e12:6.1f} TF/s"
            f"   int8 {fl / t_i8 / 1e12:6.1f} TOP/s"
            f"   ({t_bf / t_i8:.2f}x)"
        )

    # The residual-block conv as the model actually runs it (pad-early
    # form, models/transformer.py:_conv_valid): VALID 3x3 on a pre-padded
    # [B, 66, 66, 128] input, at the shipped serving batch and at a small
    # batch where bf16 under-utilizes the MXU.
    for B in (32, 128):
        H, C = 64, 128
        xp_bf = jax.random.normal(k, (B, H + 2, H + 2, C), jnp.bfloat16)
        w_bf = jax.random.normal(k, (3, 3, C, C), jnp.bfloat16) * 0.05
        xp_i8 = jnp.asarray(
            np.random.randint(-127, 127, (B, H + 2, H + 2, C), np.int8)
        )
        w_i8 = jnp.asarray(np.random.randint(-127, 127, (3, 3, C, C), np.int8))
        dn = lax.conv_dimension_numbers(
            xp_bf.shape, w_bf.shape, ("NHWC", "HWIO", "NHWC")
        )
        conv_bf = jax.jit(
            lambda x, w: lax.conv_general_dilated(
                x, w, (1, 1), "VALID", dimension_numbers=dn
            )
        )
        conv_i8 = jax.jit(
            lambda x, w: lax.conv_general_dilated(
                x, w, (1, 1), "VALID", dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
        )

        def q_block(x, w):
            # Per-tensor dynamic activation scale + int8 conv + f32 dequant:
            # the cheapest possible quantized layer (per-channel weight
            # scales would only add cost). IN re-normalizes every layer, so
            # no scale can be folded away.
            s = 127.0 / jnp.max(jnp.abs(x))
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) * s), -127, 127
            ).astype(jnp.int8)
            acc = lax.conv_general_dilated(
                xq, w, (1, 1), "VALID", dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            return acc.astype(jnp.float32) * (0.01 / s)

        qb = jax.jit(q_block)
        t_cbf = _timeit(conv_bf, xp_bf, w_bf)
        t_ci8 = _timeit(conv_i8, xp_i8, w_i8)
        t_qb = _timeit(qb, xp_bf, w_i8)
        fl = 2 * B * H * H * 9 * C * C
        print(
            f"conv 3x3 C{C} b{B:<3}  bf16 {fl / t_cbf / 1e12:6.1f} TF/s"
            f"   int8 {fl / t_ci8 / 1e12:6.1f} TOP/s ({t_cbf / t_ci8:.2f}x)"
            f"   quant+conv+dequant ({t_cbf / t_qb:.2f}x)"
        )


if __name__ == "__main__":
    main()
