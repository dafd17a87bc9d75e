"""Microbenchmark: formulations of the transform net's first conv (9x9 3->32).

Round-2 trace finding (docs/performance.md): conv1 runs at ~6% MXU because
3 input channels starve the systolic array's contraction dim — 5.1 ms alone
at b128 bf16, ~11% of the whole forward. This bench times candidate
reformulations that widen the contraction so XLA can tile the MXU densely:

- naive:   reflect-pad + 9x9 VALID conv (the shipped form)
- s2d2:    2x2 space-to-depth phase form (5x5 conv, 12->128)
- s2d4:    4x4 space-to-depth phase form (3x3 conv, 48->512)
- dxstack: stack the 9 dx taps into channels ([..., 27]) then a 9x1 conv —
           contraction per output becomes 9*27=243 (two full MXU K-tiles)

Each variant is validated against naive to ~1e-2 (bf16 MXU ulp) before
timing. Timing: a lax.scan whose carry perturbs the *kernel* by an epsilon
of the previous output, which serializes iterations with negligible
overhead; one scalar readback forces completion (axon block_until_ready
does not synchronize — see bench.py).

Run: python benchmarks/conv1_bench.py [batch] [iters]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from styletransfer_tpu.ops import layers


def naive(x, k, b):
    return layers.conv2d(x, k, b, 1, valid=True)


def s2d(x, k, b, block):
    kp = layers.phase_conv_kernel(k, block)
    ys = layers.space_to_depth(x, block)
    out = layers.conv2d(ys, kp, None, 1, valid=True)
    return layers.depth_to_space(out, block) + b.astype(out.dtype)


def dxstack(x, k, b):
    # x: [B, H+8, W+8, C]. Stack the 9 dx taps on channels -> [B, H+8, W, 9C],
    # then contract dy with a 9x1 conv whose kernel folds (dx, c).
    w_out = x.shape[2] - 8
    c = x.shape[3]
    cols = jnp.concatenate([x[:, :, i : i + w_out, :] for i in range(9)], axis=-1)
    # kernel layout: k[dy, dx, c, o] -> k2[dy, 0, dx*c + c_idx, o]
    k2 = k.reshape(9, 9 * c, k.shape[3])[:, None, :, :]
    out = jax.lax.conv_general_dilated(
        cols, k2, (1, 1), "VALID",
        dimension_numbers=layers.DIMENSION_NUMBERS,
        preferred_element_type=cols.dtype,
    )
    return out + b.astype(out.dtype)


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    size = 256
    rng = np.random.default_rng(0)

    for dtype in (jnp.bfloat16, jnp.float32):
        x = jnp.asarray(
            rng.standard_normal((batch, size + 8, size + 8, 3)), dtype=dtype
        )
        k = jnp.asarray(0.1 * rng.standard_normal((9, 9, 3, 32)), dtype=dtype)
        b = jnp.asarray(0.1 * rng.standard_normal((32,)), dtype=dtype)

        variants = {
            "naive": naive,
            "s2d2": functools.partial(s2d, block=2),
            "s2d4": functools.partial(s2d, block=4),
            "dxstack": dxstack,
        }

        if only is not None:
            variants = {n: f for n, f in variants.items() if n in only}
        ref = np.asarray(jax.jit(naive)(x, k, b), np.float32)
        for name, fn in variants.items():
            out = np.asarray(jax.jit(fn)(x, k, b), np.float32)
            err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
            assert out.shape == ref.shape, (name, out.shape, ref.shape)
            assert err < 2e-2, (name, err)

            @jax.jit
            def timed(x, k, b, fn=fn):
                def body(kc, _):
                    y = fn(x, kc, b)
                    eps = (y[0, 0, 0, 0] * 1e-12).astype(kc.dtype)
                    return kc + eps, ()

                kf, _ = jax.lax.scan(body, k, (), length=iters)
                return kf

            kf = timed(x, k, b)
            float(jnp.sum(kf))  # compile + first run
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                kf = timed(x, k, b)
                float(jnp.sum(kf))
                best = min(best, (time.perf_counter() - t0) / iters)
            print(
                f"{jnp.dtype(dtype).name:9s} {name:8s} {best * 1e3:7.2f} ms"
                f"  ({batch / best:8.0f} img/s)  relerr={err:.1e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
