"""Microbenchmark: formulations of the encoder's stride-2 convs.

Post-decoder trace (docs/performance.md): conv2 (3x3 stride-2 32->64 at
256px) runs 2.9 ms at ~7% MXU / 27 TF/s at b128 bf16 — XLA's strided conv
emitter can't tile the systolic array densely. This bench times the
space-to-depth reformulation: a stride-2 3x3 conv on pad-1 input equals a
stride-1 VALID 2x2 conv on the space-to-depth(2) view of the padded input,
with the kernel's 9 taps scattered into the 2x2 x 4-phase positions
(tap (dy,dx) -> window (dy//2, dx//2), phase (dy%2, dx%2); phase (1,1) of
window (1,1) is zero). Contraction becomes 4*Cin (dense), output stays
Cout, and no depth_to_space is needed — the small-grid output IS the
stride-2 output.

Variants:
- naive:    3x3 stride-2 VALID conv on the pre-padded input (shipped form)
- s2d2:     relayout inside the timed fn (worst case: relayout not fused)
- s2d2_pre: input already in s2d layout (models the producer's IN epilogue
            writing it — the pad-early trick, one level deeper)

Run: python benchmarks/conv_s2_bench.py [batch] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from styletransfer_tpu.ops import layers


def stride2_phase_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, O] stride-2 kernel -> [2, 2, 4C, O] for the s2d2 form.

    K2[ty, tx, (py, px, c), o] = K[2ty+py, 2tx+px, c, o] (0 where the tap
    index exceeds 2). Channel order matches :func:`layers.space_to_depth`
    (phase-major: (py, px, c)).
    """
    k, k2, c, o = kernel.shape
    assert k == 3 and k2 == 3
    kp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # [4,4,C,O]
    kp = kp.reshape(2, 2, 2, 2, c, o)  # [ty, py, tx, px, C, O]
    return kp.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * c, o)


def naive(xp, k, b):
    return layers.conv2d(xp, k, b, 2, valid=True)


def s2d2(xp, k, b):
    xs = layers.space_to_depth(xp, 2)
    return s2d2_pre(xs, k, b)


def s2d2_pre(xs, k, b):
    kp = stride2_phase_kernel(k)
    return layers.conv2d(xs, kp, b, 1, valid=True)


CASES = [
    ("conv2", 256, 32, 64),
    ("conv3", 128, 64, 128),
]


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    rng = np.random.default_rng(0)

    for dtype in (jnp.bfloat16, jnp.float32):
        for case, size, cin, cout in CASES:
            xp = jnp.asarray(
                rng.standard_normal((batch, size + 2, size + 2, cin)), dtype=dtype
            )
            k = jnp.asarray(
                0.1 * rng.standard_normal((3, 3, cin, cout)), dtype=dtype
            )
            b = jnp.asarray(0.1 * rng.standard_normal((cout,)), dtype=dtype)
            xs = jax.jit(lambda v: layers.space_to_depth(v, 2))(xp)

            variants = {
                "naive": (naive, xp),
                "s2d2": (s2d2, xp),
                "s2d2_pre": (s2d2_pre, xs),
            }
            ref = np.asarray(jax.jit(naive)(xp, k, b), np.float32)
            for name, (fn, inp) in variants.items():
                out = np.asarray(jax.jit(fn)(inp, k, b), np.float32)
                err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
                assert out.shape == ref.shape, (name, out.shape, ref.shape)
                assert err < 2e-2, (name, err)

                @jax.jit
                def timed(inp, k, b, fn=fn):
                    def body(kc, _):
                        y = fn(inp, kc, b)
                        eps = (y[0, 0, 0, 0] * 1e-12).astype(kc.dtype)
                        return kc + eps, ()

                    kf, _ = jax.lax.scan(body, k, (), length=iters)
                    return kf

                kf = timed(inp, k, b)
                float(jnp.sum(kf))  # compile + first run
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    kf = timed(inp, k, b)
                    float(jnp.sum(kf))
                    best = min(best, (time.perf_counter() - t0) / iters)
                print(
                    f"{jnp.dtype(dtype).name:9s} {case} {name:9s}"
                    f" {best * 1e3:7.2f} ms  relerr={err:.1e}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
