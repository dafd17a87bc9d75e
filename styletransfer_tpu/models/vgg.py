"""VGG19 feature extractor with loss taps, as a pure JAX function.

TPU-native rebuild of the reference ``StyleNetwork`` (network.py:204-398).
The reference slices torchvision's VGG19 ``features`` into sequential
"pieces" delimited by tap layers and re-runs the input from piece 0 for every
tap (O(taps^2) recompute, network.py:366-398). Here the tower is a single
pure function that runs **once** up to the deepest tap and returns all tapped
activations — one fused XLA graph, one pass.

Tap naming matches the reference scheme ``{LayerType}_{conv_counter}``
(network.py:267-275):
- content taps: ``Conv2d_4``  (VGG19 conv2_2, pre-ReLU) — network.py:214-220
- style taps:   ``Conv2d_1..Conv2d_5`` (conv1_1..conv3_1, pre-ReLU) —
  network.py:222-228
- feature tap:  ``ReLU_4``    (relu2_2) — network.py:230-232

Weights: pretrained torchvision VGG19 weights can be imported from a
``.pth``/``.npz`` file (:func:`load_params`); with no weight file a
deterministic seeded He-init fallback is used (useful for tests/benchmarks —
the loss *math* is identical either way).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from styletransfer_tpu.ops import layers, losses

# VGG19 `features` configuration: conv output channels, 'M' = 2x2 max pool.
VGG19_CFG: Tuple = (
    64, 64, "M",
    128, 128, "M",
    256, 256, 256, 256, "M",
    512, 512, 512, 512, "M",
    512, 512, 512, 512, "M",
)

CONTENT_LAYERS = ("Conv2d_4",)
STYLE_LAYERS = ("Conv2d_1", "Conv2d_2", "Conv2d_3", "Conv2d_4", "Conv2d_5")
FEATURE_LOSS_LAYERS = ("ReLU_4",)

DEFAULT_TAPS = tuple(sorted(set(CONTENT_LAYERS + STYLE_LAYERS + FEATURE_LOSS_LAYERS)))


def _plan(taps: Sequence[str]):
    """Static execution plan: (kind, name, cin, cout) steps up to the last tap."""
    taps = set(taps)
    steps = []
    cin, conv_i = 3, 0
    last_needed = 0
    for item in VGG19_CFG:
        if item == "M":
            steps.append(("pool", f"MaxPool2d_{conv_i}", None, None))
        else:
            conv_i += 1
            steps.append(("conv", f"Conv2d_{conv_i}", cin, item))
            steps.append(("relu", f"ReLU_{conv_i}", None, None))
            cin = item
    # Unknown tap names must fail HERE, not as a distant empty-dict
    # KeyError (or a silently-zero loss) at the caller.
    known = {name for _, name, _, _ in steps}
    unknown = taps - known
    if unknown:
        raise ValueError(
            f"unknown VGG tap name(s) {sorted(unknown)}; valid names look "
            f"like Conv2d_1..Conv2d_{conv_i} / ReLU_i / MaxPool2d_i"
        )
    # Find index of the last step whose name is a tap; truncate there.
    for i, (_, name, _, _) in enumerate(steps):
        if name in taps:
            last_needed = i
    return steps[: last_needed + 1]


def num_convs(taps: Sequence[str] = DEFAULT_TAPS) -> int:
    return sum(1 for kind, *_ in _plan(taps) if kind == "conv")


def init_params(
    key: jax.Array,
    taps: Sequence[str] = DEFAULT_TAPS,
    dtype: jnp.dtype = jnp.float32,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Deterministic He-normal init for the conv tower up to the last tap.

    A stand-in when pretrained weights are unavailable (zero-egress
    environments); random VGG features still exercise identical compute.
    """
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    for kind, name, cin, cout in _plan(taps):
        if kind != "conv":
            continue
        key, sub = jax.random.split(key)
        fan_in = 9 * cin
        kernel = jax.random.normal(sub, (3, 3, cin, cout), dtype) * jnp.sqrt(
            2.0 / fan_in
        )
        params[name] = {"kernel": kernel, "bias": jnp.zeros((cout,), dtype)}
    return params


def extract_features(
    params: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    taps: Sequence[str] = DEFAULT_TAPS,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Dict[str, jnp.ndarray]:
    """Run NHWC images through VGG19 features, returning tapped activations.

    One forward pass shared by every loss — the single-pass replacement for
    the reference's ``run_through_pieces`` per tap (network.py:366-398).
    VGG convs use zero padding of 1 (torch default), not reflection.
    """
    want = set(taps)
    out: Dict[str, jnp.ndarray] = {}
    for kind, name, _, _ in _plan(taps):
        if kind == "conv":
            p = params[name]
            x = layers.conv2d(
                x,
                p["kernel"],
                p["bias"],
                stride=1,
                reflect=False,
                compute_dtype=compute_dtype,
            )
        elif kind == "relu":
            x = jnp.maximum(x, 0.0)
        else:  # pool
            x = layers.max_pool(x, 2, 2)
        if name in want:
            out[name] = x
    return out


def style_gram_targets(
    params,
    style_image: jnp.ndarray,
    style_layers: Sequence[str] = STYLE_LAYERS,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Dict[str, jnp.ndarray]:
    """Precompute the per-tap Gram targets for a style image [1,H,W,3].

    The reference computes these once at ``StyleNetwork.__init__``
    (network.py:297-300) and detaches them; here they are just constants.
    """
    feats = extract_features(params, style_image, style_layers, compute_dtype)
    return {name: losses.gram_matrix(feats[name]) for name in style_layers}


def perceptual_loss(
    params,
    input_image: jnp.ndarray,
    content_image: jnp.ndarray,
    style_grams: Dict[str, jnp.ndarray],
    style_weight: float = 100_000.0,
    content_weight: float = 1.0,
    content_layers: Sequence[str] = CONTENT_LAYERS,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted style + content perceptual objective, one VGG pass per image.

    Equivalent of StyleNetwork.forward + the loss aggregators
    (network.py:342-398): content targets are recomputed from
    ``content_image`` each call (the per-batch retargeting of
    network.py:378-386) under ``stop_gradient``; style targets are the
    precomputed ``style_grams``.

    Returns ``(total, components)`` where components holds the unweighted
    sums for logging parity.
    """
    taps = tuple(sorted(set(tuple(style_grams) + tuple(content_layers))))
    in_feats = extract_features(params, input_image, taps, compute_dtype)
    content_feats = extract_features(params, content_image, content_layers, compute_dtype)

    s_loss = jnp.float32(0.0)
    for name, tgt in style_grams.items():
        s_loss = s_loss + losses.style_loss(in_feats[name], jax.lax.stop_gradient(tgt))

    c_loss = jnp.float32(0.0)
    for name in content_layers:
        c_loss = c_loss + losses.content_loss(
            in_feats[name], jax.lax.stop_gradient(content_feats[name])
        )

    total = style_weight * s_loss + content_weight * c_loss
    return total, {"style": s_loss, "content": c_loss}


def feature_loss(
    params,
    input_image: jnp.ndarray,
    content_image: jnp.ndarray,
    feature_layers: Sequence[str] = FEATURE_LOSS_LAYERS,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Feature-reconstruction loss at the ReLU_4 tap (network.py:167-201).

    Unused by default training (the reference comments it out,
    network.py:704-709) but part of ``static_test`` (network.py:772-796).
    """
    in_feats = extract_features(params, input_image, feature_layers, compute_dtype)
    tgt_feats = extract_features(params, content_image, feature_layers, compute_dtype)
    total = jnp.float32(0.0)
    for name in feature_layers:
        total = total + losses.feature_reconstruction_loss(
            in_feats[name], jax.lax.stop_gradient(tgt_feats[name])
        )
    return total


# ---------------------------------------------------------------------------
# Pretrained-weight import (torchvision .pth state dict or .npz).
# ---------------------------------------------------------------------------

# torchvision vgg19().features module indices for each conv, in order.
_TORCHVISION_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34)


def import_torch_state_dict(
    state_dict, taps: Sequence[str] = DEFAULT_TAPS
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Convert a torchvision VGG19 state dict to our HWIO param pytree.

    Accepts keys of either the bare-``features`` form (``0.weight``) or the
    full-model form (``features.0.weight``). Torch kernels are OIHW;
    converted to HWIO.
    """
    def get(idx: int, leaf: str) -> np.ndarray:
        for k in (f"{idx}.{leaf}", f"features.{idx}.{leaf}"):
            if k in state_dict:
                v = state_dict[k]
                return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        raise KeyError(f"VGG19 state dict missing features.{idx}.{leaf}")

    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    n = num_convs(taps)
    for conv_i in range(1, n + 1):
        idx = _TORCHVISION_CONV_IDX[conv_i - 1]
        w = get(idx, "weight")  # OIHW
        b = get(idx, "bias")
        params[f"Conv2d_{conv_i}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # -> HWIO
            "bias": jnp.asarray(b),
        }
    return params


def find_weights(weights_path: Optional[str] = None) -> Optional[str]:
    """First existing pretrained-VGG19 weights file, or None.

    Search order (same as :func:`load_params`, which delegates here):
    explicit path -> ``$STX_VGG19_WEIGHTS`` -> ``data/models/vgg19.npz`` /
    ``.pth`` under the project root. An EXPLICIT ``weights_path`` that
    does not exist raises ``FileNotFoundError`` (never a silent
    fall-through to weights the caller didn't ask for); the env/default
    candidates remain best-effort.
    """
    from styletransfer_tpu import constants

    candidates = []
    if weights_path:
        # An EXPLICIT path that doesn't exist is an error, not a reason
        # to silently fall through to env/default weights (or random
        # init) the caller never asked for.
        if not os.path.isfile(weights_path):
            raise FileNotFoundError(
                f"VGG19 weights file not found: {weights_path!r}"
            )
        candidates.append(weights_path)
    env = os.environ.get("STX_VGG19_WEIGHTS")
    if env:
        candidates.append(env)
    for name in ("vgg19.npz", "vgg19.pth", "vgg19-dcbb9e9d.pth"):
        candidates.append(
            os.path.join(constants.PROJECT_ROOT_PATH, "data", "models", name)
        )
    for path in candidates:
        if path and os.path.isfile(path):
            return path
    return None


def load_params(
    weights_path: Optional[str] = None,
    taps: Sequence[str] = DEFAULT_TAPS,
    seed: int = 0,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Load VGG19 tap params: pretrained if available, else seeded init.

    Search order: explicit ``weights_path`` (missing file raises) ->
    ``$STX_VGG19_WEIGHTS`` -> ``data/models/vgg19.npz`` /
    ``data/models/vgg19.pth`` under the repo root
    -> deterministic He init (logged).
    """
    from styletransfer_tpu.utils.logging import get_logger

    path = find_weights(weights_path)
    if path:
        if path.endswith(".npz"):
            data = dict(np.load(path))
            return import_torch_state_dict(data, taps)
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return import_torch_state_dict(sd, taps)

    get_logger().warning(
        "No pretrained VGG19 weights found (searched explicit path, "
        "$STX_VGG19_WEIGHTS, data/models/vgg19.{npz,pth}); using "
        "deterministic seeded initialization. Set STX_VGG19_WEIGHTS for "
        "pretrained features.",
    )
    return init_params(jax.random.PRNGKey(seed), taps)
