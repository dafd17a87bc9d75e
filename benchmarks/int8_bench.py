"""Is an int8 quantized serving tier worth building on this TPU?

Measures XLA's int8 (s8 x s8 -> s32) matmul/conv throughput against bf16
at (a) large square matmuls, where the MXU's double-rate int8 path shows
its peak, and (b) the exact shape of the fast_st residual-block conv —
the hottest op of the serving forward (docs/performance.md).

Measured 2026-08-17 (TPU v5 lite, tunneled backend):

  matmul 4096^3   bf16  69.0 TF/s   int8  72.2 TOP/s   (1.05x)
  matmul 8192^3   bf16 124.2 TF/s   int8 192.1 TOP/s   (1.55x)
  conv 3x3 C128   bf16  24.7 TF/s   int8  27.2 TOP/s   (1.10x)
  (32x64x64x128 NHWC, the residual-stack shape)

Conclusion (recorded in docs/performance.md): the int8 double-rate path
only materializes at contraction/output dims far larger than this model
ever reaches (C<=128 => K=9*128=1152). At the model's shapes int8 buys
~10% on an op that is ~27% of the forward — under 3% end-to-end before
paying per-tensor scale bookkeeping and the f32 dequant the IN stats
need. Rejected; revisit only for models with >=512-channel convs.
"""

from __future__ import annotations

import time

import numpy as np


def _timeit(f, *args, n=20):
    import jax.numpy as jnp

    r = f(*args)
    float(jnp.sum(r.astype(jnp.float32)))  # sync (axon ignores block_until_ready)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


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

    # The residual-block conv shape (models/transformer.py): 3x3 C128.
    B, H, C = 32, 64, 128
    x_bf = jax.random.normal(k, (B, H, H, C), jnp.bfloat16)
    w_bf = jax.random.normal(k, (3, 3, C, C), jnp.bfloat16) * 0.05
    x_i8 = jnp.asarray(np.random.randint(-127, 127, (B, H, H, C), np.int8))
    w_i8 = jnp.asarray(np.random.randint(-127, 127, (3, 3, C, C), np.int8))
    dn = lax.conv_dimension_numbers(
        x_bf.shape, w_bf.shape, ("NHWC", "HWIO", "NHWC")
    )
    conv_bf = jax.jit(
        lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn
        )
    )
    conv_i8 = jax.jit(
        lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
    )
    t_cbf = _timeit(conv_bf, x_bf, w_bf)
    t_ci8 = _timeit(conv_i8, x_i8, w_i8)
    fl = 2 * B * H * H * 9 * C * C
    print(
        f"conv 3x3 C{C}  bf16 {fl / t_cbf / 1e12:6.1f} TF/s"
        f"   int8 {fl / t_ci8 / 1e12:6.1f} TOP/s"
        f"   ({t_cbf / t_ci8:.2f}x)"
    )


if __name__ == "__main__":
    main()
