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


MODEL_NAME = "fast_multi_st"


def train(
    style_images: jnp.ndarray,
    style_name: str = "multi",
    epochs: int = 50,
    batch_size: int = 4,
    style_weight: float = 100_000.0,
    content_weight: float = 1.0,
    vgg_params=None,
    params=None,
    train_loader=None,
    seed: int = 0,
    models_path: Optional[str] = None,
    max_steps_per_epoch: Optional[int] = None,
    precision: str = "f32",
):
    """Train one network on a stack of styles [S, H, W, 3].

    Each batch element draws a uniform-random style index per step. Keeps
    the per-epoch checkpoint/resume contract under the model name
    ``fast_multi_st``. Returns the trained params.
    """
    import numpy as np

    from styletransfer_tpu import ckpt
    from styletransfer_tpu.data import coco
    from styletransfer_tpu.parallel import mesh as mesh_lib
    from styletransfer_tpu.parallel import prefetch
    from styletransfer_tpu.utils.logging import get_logger

    logger = get_logger()
    mesh = mesh_lib.auto_mesh(batch_size)
    compute_dtype = jnp.bfloat16 if precision == "bf16" else None

    if vgg_params is None:
        vgg_params = vgg.load_params()
    n_styles = style_images.shape[0]
    grams = stack_style_grams(vgg_params, style_images)
    vgg_params = mesh_lib.replicate(vgg_params, mesh)
    grams = mesh_lib.replicate(grams, mesh)

    if params is None:
        params = multistyle.init_params(
            jax.random.PRNGKey(seed), num_styles=n_styles
        )
    params = mesh_lib.replicate(params, mesh)

    opt, train_step = make_train_step(
        vgg_params, grams, style_weight, content_weight,
        compute_dtype=compute_dtype,
    )
    opt_state = mesh_lib.replicate(opt.init(params), mesh)

    if train_loader is None:
        _, train_loader = coco.get_coco_loader(batch_size=batch_size, seed=seed)

    rng = np.random.default_rng(seed)
    iteration = 0
    for epoch in range(epochs):
        if ckpt.epoch_checkpoint_exists(MODEL_NAME, style_name, epoch, models_path):
            params, _ = ckpt.load_latest_transformer(
                MODEL_NAME, style_name, params, models_path
            )
            params = mesh_lib.replicate(params, mesh)
            opt_state = mesh_lib.replicate(opt.init(params), mesh)
            logger.info("Epoch %d checkpoint exists; skipping", epoch)
            continue
        logger.info("Starting multi-style epoch %d (%d styles)", epoch, n_styles)
        n = 0
        for batch in prefetch.prefetch_to_device(train_loader, mesh):
            idx = mesh_lib.shard_batch(
                rng.integers(0, n_styles, batch.shape[0]).astype(np.int32), mesh
            )
            params, opt_state, metrics = train_step(params, opt_state, batch, idx)
            if iteration % 20 == 0:
                logger.info("Batch Loss: %.8f", float(metrics["total"]))
            iteration += 1
            n += 1
            if max_steps_per_epoch and n >= max_steps_per_epoch:
                break
        ckpt.save_epoch(params, MODEL_NAME, style_name, epoch, models_path)
    return params


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def stylize(params, images, style_idx, compute_dtype=None):
    """Stylize a batch with per-sample hard style selection."""
    return multistyle.apply(params, images, style_idx, compute_dtype)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def stylize_blend(params, images, weights, compute_dtype=None):
    """Stylize a batch with per-sample convex style blends [B, S]."""
    return multistyle.apply_blend(params, images, weights, compute_dtype)
