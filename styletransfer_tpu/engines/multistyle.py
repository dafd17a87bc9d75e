"""Multi-style fast transfer: one network, N styles (extension).

Training pairs each batch element with a (randomly drawn) style index; the
style loss compares each sample's Gram matrices against *its own* style's
precomputed targets. Everything else (content + TV loss, Adam, DP sharding,
checkpointing) reuses the single-style machinery.

Inference: ``stylize(params, images, style_idx)`` for hard selection or
``stylize_blend(params, images, weights)`` for continuous style
interpolation — both are pure data, no recompiles across styles.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from styletransfer_tpu.engines.fast import make_optimizer
from styletransfer_tpu.models import multistyle, vgg
from styletransfer_tpu.ops import losses
from styletransfer_tpu.utils import images as img_utils


def stack_style_grams(
    vgg_params, style_images: jnp.ndarray, compute_dtype=None
) -> Dict[str, jnp.ndarray]:
    """Per-tap Gram targets for a stack of style images [S, H, W, 3] ->
    {tap: [S, C, C]}."""
    feats = vgg.extract_features(
        vgg_params, style_images, vgg.STYLE_LAYERS, compute_dtype
    )
    return {name: losses.gram_matrix(feats[name]) for name in vgg.STYLE_LAYERS}


def multistyle_loss(
    params,
    batch: jnp.ndarray,
    style_idx: jnp.ndarray,
    vgg_params,
    style_grams: Dict[str, jnp.ndarray],
    style_weight: float,
    content_weight: float,
    compute_dtype=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    batch = img_utils.maybe_normalize_on_device(batch)
    transformed = multistyle.apply(params, batch, style_idx, compute_dtype)

    taps = tuple(sorted(set(vgg.STYLE_LAYERS + vgg.CONTENT_LAYERS)))
    in_feats = vgg.extract_features(vgg_params, transformed, taps, compute_dtype)
    content_feats = vgg.extract_features(
        vgg_params, batch, vgg.CONTENT_LAYERS, compute_dtype
    )

    s_loss = jnp.float32(0.0)
    for name in vgg.STYLE_LAYERS:
        g = losses.gram_matrix(in_feats[name])
        tgt = jax.lax.stop_gradient(style_grams[name][style_idx])  # [B, C, C]
        s_loss = s_loss + jnp.mean(jnp.square(g - tgt))

    c_loss = jnp.float32(0.0)
    for name in vgg.CONTENT_LAYERS:
        c_loss = c_loss + losses.content_loss(
            in_feats[name], jax.lax.stop_gradient(content_feats[name])
        )

    tv = losses.total_variation_loss(transformed)
    total = style_weight * s_loss + content_weight * c_loss + tv
    return total, {"total": total, "style": s_loss, "content": c_loss, "tv": tv}


def make_train_step(
    vgg_params,
    style_grams: Dict[str, jnp.ndarray],
    style_weight: float = 100_000.0,
    content_weight: float = 1.0,
    optimizer: Optional[optax.GradientTransformation] = None,
    compute_dtype=None,
):
    """Jitted (params, opt_state, batch, style_idx) step."""
    opt = optimizer or make_optimizer()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, style_idx):
        (_, metrics), grads = jax.value_and_grad(multistyle_loss, has_aux=True)(
            params, batch, style_idx, vgg_params, style_grams,
            style_weight, content_weight, compute_dtype,
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return opt, train_step


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def stylize(params, images, style_idx, compute_dtype=None):
    """Stylize a batch with per-sample hard style selection."""
    return multistyle.apply(params, images, style_idx, compute_dtype)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def stylize_blend(params, images, weights, compute_dtype=None):
    """Stylize a batch with per-sample convex style blends [B, S]."""
    return multistyle.apply_blend(params, images, weights, compute_dtype)
