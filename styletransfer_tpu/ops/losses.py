"""Loss functions: Gram/style, content, feature-reconstruction, total
variation, and temporal consistency.

Pure-functional rebuilds of the loss modules in ``stransfer/network.py``.
The reference stores losses as stateful ``nn.Module`` attributes
(``self.loss`` — network.py:118, 163) and mutates targets in place; here
every loss is ``f(features, target) -> scalar`` so the whole objective is one
fused XLA graph under jit, and gradients flow through ``jax.grad`` with no
hidden state.

Normalization conventions are kept bit-for-bit compatible with the reference:
- Gram matrices are normalized by C*H*W (NOT batch) — network.py:92-108.
- Style loss is the MSE between input grams and the single style gram
  broadcast over the batch — network.py:110-123.
- Content loss is a plain MSE over features — network.py:155-164.
- Feature-reconstruction loss is MSE^2 / (B*C*H*W) — network.py:186-201.
- TV regularization is the anisotropic L1 *sum* (not mean) scaled by 1e-6 —
  network.py:621-641.
- Temporal loss is ||Δstylized||_F / (||Δcontent||_F + 1) * w —
  network.py:885-903.

All feature tensors are NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gram_matrix(features: jnp.ndarray) -> jnp.ndarray:
    """Batched Gram matrix of NHWC features, normalized by C*H*W.

    [B, H, W, C] -> [B, C, C]; G[b] = F_b^T F_b / (C*H*W) where F_b is the
    [H*W, C] feature matrix. This is one big batched matmul — exactly the
    MXU's shape — replacing the reference's ``torch.bmm`` (network.py:104).

    Custom VJP: autodiff of the self-outer-product emits TWO [B, H*W, C]-
    sized dots (one per ``f`` argument) plus layout copies — measured ~14%
    of the whole fast_st train step at b128 (docs/performance.md). The
    closed form needs ONE dot against a tiny symmetrized [B, C, C] factor:
    dF = F (M + M^T) / (C*H*W).
    """
    b, h, w, c = features.shape
    f = features.reshape(b, h * w, c)
    g = jnp.einsum("bnc,bnd->bcd", f, f, preferred_element_type=jnp.float32)
    return g / (c * h * w)


def _gram_fwd(features):
    return gram_matrix(features), features


def _gram_bwd(features, m):
    b, h, w, c = features.shape
    f = features.reshape(b, h * w, c)
    # S = (M + M^T)/(C·H·W) is [B, C, C] — symmetric and tiny; the single
    # heavy dot runs in the features' dtype with f32 accumulation. (An
    # NHWC-form variant of this dot — no [B, N, C] reshape, hoping to skip
    # the cotangent relayout copy before the VGG conv backward — measured
    # slightly SLOWER end to end; keep the flattened form.)
    s = ((m + jnp.swapaxes(m, 1, 2)) / (c * h * w)).astype(f.dtype)
    df = jnp.einsum("bnd,bde->bne", f, s, preferred_element_type=jnp.float32)
    return (df.astype(features.dtype).reshape(features.shape),)


gram_matrix.defvjp(_gram_fwd, _gram_bwd)


def style_loss(features: jnp.ndarray, target_gram: jnp.ndarray) -> jnp.ndarray:
    """MSE between the features' Gram and a (batch-1) target Gram.

    ``target_gram``: [1, C, C] (or [C, C]) precomputed from the style image;
    broadcast over the batch like the reference's ``expand_as``
    (network.py:117-121).
    """
    g = gram_matrix(features)
    tgt = target_gram.astype(jnp.float32)
    if tgt.ndim == 2:
        tgt = tgt[None]
    return jnp.mean(jnp.square(g - tgt))


def content_loss(features: jnp.ndarray, target_features: jnp.ndarray) -> jnp.ndarray:
    """Plain MSE between input and target features (network.py:155-164).

    The target is treated as a constant (the reference detaches it,
    network.py:153); callers should wrap with ``jax.lax.stop_gradient`` if the
    target is itself a traced computation.
    """
    return jnp.mean(
        jnp.square(features.astype(jnp.float32) - target_features.astype(jnp.float32))
    )


def feature_reconstruction_loss(
    features: jnp.ndarray, target_features: jnp.ndarray
) -> jnp.ndarray:
    """MSE squared over B*C*H*W (network.py:186-201).

    Kept for parity with the reference's ``FeatureReconstructionLoss`` which
    is unused in training by default but exercised by ``static_test``
    (network.py:772-796).
    """
    mse = content_loss(features, target_features)
    return jnp.square(mse) / features.size


def total_variation_loss(
    image: jnp.ndarray, regularization_factor: float = 1e-6
) -> jnp.ndarray:
    """Anisotropic total-variation L1 loss (sum-reduced) on NHWC images.

    Matches ``get_total_variation_regularization_loss`` (network.py:621-641):
    sum of absolute horizontal + vertical neighbor differences, scaled.
    """
    x = image.astype(jnp.float32)
    dw = jnp.sum(jnp.abs(x[:, :, :-1, :] - x[:, :, 1:, :]))
    dh = jnp.sum(jnp.abs(x[:, :-1, :, :] - x[:, 1:, :, :]))
    return regularization_factor * (dw + dh)


def temporal_loss(
    old_content: jnp.ndarray,
    old_stylized: jnp.ndarray,
    current_content: jnp.ndarray,
    current_stylized: jnp.ndarray,
    temporal_weight: float = 1.0,
) -> jnp.ndarray:
    """Temporal consistency loss (network.py:885-903).

    Penalizes change in the stylized stream relative to change in the content
    stream: ||s_t - s_{t-1}||_F / (||c_t - c_{t-1}||_F + 1) * w. Frobenius
    norms are over the full batch tensor, matching ``torch.Tensor.norm()``.
    """
    ds = jnp.linalg.norm(
        (current_stylized - old_stylized).astype(jnp.float32).reshape(-1)
    )
    dc = jnp.linalg.norm(
        (current_content - old_content).astype(jnp.float32).reshape(-1)
    )
    return (ds / (dc + 1.0)) * temporal_weight
