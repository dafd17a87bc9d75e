"""Numeric parity tests for the loss functions vs. the reference math.

Each loss is checked against an independent torch implementation that
transcribes the reference formulas (stransfer/network.py:79-201, 621-641,
885-903) — NOT against the reference code itself. Feature tensors on the
torch side are NCHW; ours are NHWC.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from styletransfer_tpu.ops import losses


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def torch_gram(x: torch.Tensor) -> torch.Tensor:
    # Transcription of reference network.py:92-108.
    bs, depth, height, width = x.size()
    features = x.view(bs, depth, height * width)
    g = torch.bmm(features, features.transpose(1, 2))
    return g.div(depth * height * width)


@pytest.fixture
def feats(rng):
    return rng.standard_normal((2, 8, 6, 5)).astype(np.float32)  # NHWC


def test_gram_matrix_matches_torch(feats):
    ours = np.asarray(losses.gram_matrix(jnp.asarray(feats)))
    theirs = torch_gram(_nchw(feats)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_style_loss_matches_torch(feats, rng):
    style = rng.standard_normal((1, 8, 6, 5)).astype(np.float32)
    target_gram = losses.gram_matrix(jnp.asarray(style))
    ours = float(losses.style_loss(jnp.asarray(feats), target_gram))

    t_target = torch_gram(_nchw(style))
    t_g = torch_gram(_nchw(feats))
    theirs = float(F.mse_loss(t_g, t_target.expand_as(t_g)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_content_loss_matches_torch(feats, rng):
    target = rng.standard_normal(feats.shape).astype(np.float32)
    ours = float(losses.content_loss(jnp.asarray(feats), jnp.asarray(target)))
    theirs = float(F.mse_loss(_nchw(feats), _nchw(target)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_feature_reconstruction_loss_matches_torch(feats, rng):
    # Reference network.py:186-201: mse^2 / (B*C*H*W).
    target = rng.standard_normal(feats.shape).astype(np.float32)
    ours = float(
        losses.feature_reconstruction_loss(jnp.asarray(feats), jnp.asarray(target))
    )
    mse = F.mse_loss(_nchw(feats), _nchw(target))
    theirs = float(mse.pow(2) / feats.size)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_total_variation_matches_torch(rng):
    img = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    ours = float(losses.total_variation_loss(jnp.asarray(img)))
    t = _nchw(img)
    # Reference network.py:634-641 (sum-reduced anisotropic L1, x 1e-6).
    theirs = float(
        1e-6
        * (
            torch.sum(torch.abs(t[:, :, :, :-1] - t[:, :, :, 1:]))
            + torch.sum(torch.abs(t[:, :, :-1, :] - t[:, :, 1:, :]))
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_temporal_loss_matches_torch(rng):
    shapes = (2, 8, 8, 3)
    oc, os_, cc, cs = (rng.standard_normal(shapes).astype(np.float32) for _ in range(4))
    ours = float(
        losses.temporal_loss(
            jnp.asarray(oc), jnp.asarray(os_), jnp.asarray(cc), jnp.asarray(cs),
            temporal_weight=0.8,
        )
    )
    # Reference network.py:885-903.
    change_style = (_nchw(cs) - _nchw(os_)).norm()
    change_content = (_nchw(cc) - _nchw(oc)).norm()
    theirs = float((change_style / (change_content + 1)) * 0.8)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_gram_hand_computed():
    # 1x1 spatial, 2 channels: features [[1],[2]] -> G = [[1,2],[2,4]]/(2*1*1)
    f = jnp.asarray([[[[1.0, 2.0]]]])  # NHWC [1,1,1,2]
    g = np.asarray(losses.gram_matrix(f))[0]
    np.testing.assert_allclose(g, np.array([[0.5, 1.0], [1.0, 2.0]]))


def test_gram_custom_vjp_matches_autodiff(feats):
    """gram_matrix's single-dot custom VJP == plain autodiff of the formula.

    The custom backward computes dF = F (M + M^T)/(C*H*W) in one dot; it
    must equal jax.grad of a no-custom-vjp transcription bit-for-bit at f32
    (same contraction order, f32 accumulation).
    """
    import jax

    def naive_gram(features):
        b, h, w, c = features.shape
        f = features.reshape(b, h * w, c)
        g = jnp.einsum("bnc,bnd->bcd", f, f, preferred_element_type=jnp.float32)
        return g / (c * h * w)

    tgt = jnp.asarray(np.ones((5, 5), np.float32))

    def loss_custom(x):
        return jnp.mean(jnp.square(losses.gram_matrix(x) - tgt))

    def loss_naive(x):
        return jnp.mean(jnp.square(naive_gram(x) - tgt))

    x = jnp.asarray(feats)
    g_custom = jax.grad(loss_custom)(x)
    g_naive = jax.grad(loss_naive)(x)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_naive), rtol=1e-5, atol=1e-7
    )
    # And through a second-order-free consumer: value matches too.
    np.testing.assert_allclose(
        float(loss_custom(x)), float(loss_naive(x)), rtol=1e-6
    )


def test_gram_custom_vjp_bf16_path(feats):
    """bf16 features: the custom VJP returns a bf16 cotangent of the right
    shape and stays finite (the heavy dot runs in bf16 with f32 accum)."""
    import jax

    x = jnp.asarray(feats).astype(jnp.bfloat16)
    tgt = jnp.zeros((5, 5), jnp.float32)

    def loss(x):
        return jnp.mean(jnp.square(losses.gram_matrix(x) - tgt))

    g = jax.grad(loss)(x)
    assert g.dtype == jnp.bfloat16 and g.shape == x.shape
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())
