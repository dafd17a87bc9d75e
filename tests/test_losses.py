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
