"""Numerics of the Pallas residual-stack conv (ops/pallas/conv3x3.py).

Runs in interpreter mode on the CPU test backend; the TPU performance
decision lives in benchmarks/pallas_conv_bench.py + docs/performance.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styletransfer_tpu.ops.pallas.conv3x3 import conv3x3_valid


def _ref_conv(x, w, b, relu):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    return jnp.maximum(out, 0.0) if relu else out


@pytest.mark.parametrize("relu", [False, True])
def test_conv3x3_valid_matches_lax(relu):
    rng = np.random.default_rng(0)
    B, H, W, C, O = 2, 16, 16, 128, 128
    x = jnp.asarray(rng.standard_normal((B, H + 2, W + 2, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, O)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(O), jnp.float32)

    out, s, ss = conv3x3_valid(x, w, b, relu=relu, interpret=True)
    ref = _ref_conv(x, w, b, relu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # Sum over H*W without relu can near-cancel -> reassociation noise.
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(jnp.sum(ref, axis=(1, 2))),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ss), np.asarray(jnp.sum(ref * ref, axis=(1, 2))),
        rtol=1e-4, atol=1e-4,
    )


def test_conv3x3_stats_feed_instance_norm():
    """The emitted sums reproduce instance-norm stats: mean/var from the
    kernel's (sum, sumsq) equal stats computed from the full output."""
    rng = np.random.default_rng(1)
    B, H, W, C = 2, 8, 8, 128
    x = jnp.asarray(rng.standard_normal((B, H + 2, W + 2, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(C), jnp.float32)

    out, s, ss = conv3x3_valid(x, w, b, relu=True, interpret=True)
    n = H * W
    mean = np.asarray(s) / n
    var = np.asarray(ss) / n - mean**2
    ref_mean = np.asarray(out, np.float32).mean(axis=(1, 2))
    ref_var = np.asarray(out, np.float32).var(axis=(1, 2))
    np.testing.assert_allclose(mean, ref_mean, atol=1e-5)
    np.testing.assert_allclose(var, ref_var, rtol=1e-4, atol=1e-5)
