"""Multi-style transform network via conditional instance normalization.

An *extension* beyond the reference's one-network-per-style design
("A Learned Representation for Artistic Style", Dumoulin et al., 2017 — the
technique behind the retrieved "Multiple Style-Transfer in Real-Time"
paper): all convolutional weights are shared across N styles and only the
instance-norm affine parameters are per-style. Selecting a style is a
gather of its (scale, bias) embedding; blending styles is a convex
combination of embeddings.

This rides the same layers as :mod:`styletransfer_tpu.models.transformer`
(``ops.layers.instance_norm`` accepts per-sample ``[B, C]`` affines), so one
jitted program serves any mix of styles in a batch — TPU-friendly: the
style choice is data, not a recompile.

Parameter layout: identical tree to the single-style net, except every IN
``scale``/``bias`` leaf has a leading style axis ``[S, C]``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from styletransfer_tpu.models import transformer
from styletransfer_tpu.ops import layers

Params = Dict[str, Any]

_IN_KEYS = ("in1", "in2", "in3", "up1_in", "up2_in")


def _is_affine_path(path) -> bool:
    keys = [getattr(p, "key", None) for p in path]
    return any(k in _IN_KEYS or k in ("in1", "in2") for k in keys) and keys[-1] in (
        "scale", "bias",
    )


def init_params(
    key: jax.Array,
    num_styles: int,
    in_channels: int = 3,
    dtype: jnp.dtype = jnp.float32,
) -> Params:
    """Single-style init broadcast to ``num_styles`` IN embeddings."""
    base = transformer.init_params(key, in_channels=in_channels, dtype=dtype)

    def lift(path, leaf):
        if _is_affine_path(path):
            return jnp.broadcast_to(leaf, (num_styles,) + leaf.shape).copy()
        return leaf

    return jax.tree_util.tree_map_with_path(lift, base)


def num_styles(params: Params) -> int:
    return params["in1"]["scale"].shape[0]


def select_styles(params: Params, style_idx: jnp.ndarray) -> Params:
    """Gather per-sample IN affines: ``[S, C]`` -> ``[B, C]`` by index.

    ``style_idx``: int array [B]. Returns a param tree usable by
    :func:`transformer.apply` via the conditional-affine path.
    """

    def pick(path, leaf):
        if _is_affine_path(path):
            return leaf[style_idx]
        return leaf

    return jax.tree_util.tree_map_with_path(pick, params)


def blend_styles(params: Params, weights: jnp.ndarray) -> Params:
    """Convex-combine style embeddings: ``weights`` [B, S] (rows sum to 1).

    Style interpolation at inference — e.g. a 50/50 blend of two styles —
    with zero recompilation.
    """

    def mix(path, leaf):
        if _is_affine_path(path):
            return jnp.einsum("bs,sc->bc", weights, leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(mix, params)


def apply(
    params: Params,
    x: jnp.ndarray,
    style_idx: jnp.ndarray,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Forward pass with a per-sample style index [B]."""
    return transformer.apply(
        select_styles(params, style_idx), x, compute_dtype=compute_dtype,
        use_pallas=False,
    )


def apply_blend(
    params: Params,
    x: jnp.ndarray,
    weights: jnp.ndarray,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Forward pass with per-sample style blend weights [B, S]."""
    return transformer.apply(
        blend_styles(params, weights), x, compute_dtype=compute_dtype,
        use_pallas=False,
    )
