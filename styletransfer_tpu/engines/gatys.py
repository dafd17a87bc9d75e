"""Gatys optimization-based style transfer, fully on device.

TPU-native rebuild of ``StyleNetwork.train_gatys`` (network.py:411-458).
The reference runs torch L-BFGS over the pixels in eager mode, re-running the
VGG tower once per tap per closure and syncing the loss to host every step
(network.py:437-456). Here the whole optimization is **one jitted program**:
the VGG pass is single-pass multi-tap, the update loop is a ``lax.scan`` over
optimizer steps, and the only host transfer is the final image + the loss
history array.

Three optimizers:
- ``lbfgs`` (default): torch-contract L-BFGS
  (:mod:`styletransfer_tpu.ops.lbfgs`) — each "step" is one
  ``torch.optim.LBFGS.step(closure)`` with the reference's defaults
  (``max_iter=20`` fixed-step inner iterations, persistent history), so the
  CLI's ``-s 300`` performs the same ~6,000 closure evaluations as the
  reference (network.py:435 + torch LBFGS defaults), with a
  trajectory-parity test against the imported reference.
- ``lbfgs-zoom``: optax L-BFGS with zoom linesearch — one linesearched
  update per step; reaches comparable loss in far fewer evals (see
  docs/performance.md) when iteration-for-iteration parity isn't needed.
- ``adam``: jit-scanned Adam over pixels (the reference keeps an
  Adam/random-init variant commented at network.py:431-433; the driver's
  baseline config is "~100 Adam iters").
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from styletransfer_tpu.models import vgg
from styletransfer_tpu.utils.logging import get_logger


def make_loss_fn(
    vgg_params,
    content_image: jnp.ndarray,
    style_grams: Dict[str, jnp.ndarray],
    style_weight: float = 100_000.0,
    content_weight: float = 1.0,
    compute_dtype=None,
):
    """Pixel objective: weighted style (Gram MSE) + content (feature MSE).

    Content targets are recomputed from ``content_image`` inside the loss —
    matching the reference's retargeting semantics (network.py:378-386) — but
    XLA hoists that constant subcomputation out of the scan loop since
    ``content_image`` is loop-invariant.
    """

    def loss_fn(pixels: jnp.ndarray) -> jnp.ndarray:
        total, _ = vgg.perceptual_loss(
            vgg_params,
            pixels,
            content_image,
            style_grams,
            style_weight=style_weight,
            content_weight=content_weight,
            compute_dtype=compute_dtype,
        )
        return total

    return loss_fn


@functools.partial(
    jax.jit,
    static_argnames=(
        "steps", "style_weight", "content_weight", "learning_rate", "compute_dtype"
    ),
)
def _run_adam(
    vgg_params,
    content_image,
    style_grams,
    steps: int,
    style_weight: float,
    content_weight: float,
    learning_rate: float,
    compute_dtype=None,
    init_pixels=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    loss_fn = make_loss_fn(
        vgg_params, content_image, style_grams, style_weight, content_weight,
        compute_dtype=compute_dtype,
    )
    opt = optax.adam(learning_rate)
    # Start from the content image (network.py:429) unless a warm start is
    # given (coarse-to-fine: the upsampled low-res result; the loss target
    # stays the content image either way).
    pixels0 = content_image if init_pixels is None else init_pixels
    opt_state0 = opt.init(pixels0)

    def step(carry, _):
        pixels, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(pixels)
        updates, opt_state = opt.update(grads, opt_state, pixels)
        pixels = optax.apply_updates(pixels, updates)
        return (pixels, opt_state), loss

    (pixels, _), losses = jax.lax.scan(step, (pixels0, opt_state0), None, length=steps)
    return pixels, losses


@functools.partial(
    jax.jit,
    static_argnames=(
        "steps", "style_weight", "content_weight", "compute_dtype",
        "max_iter", "history_size", "history_math",
    ),
)
def _run_lbfgs_torch(
    vgg_params,
    content_image,
    style_grams,
    steps: int,
    style_weight: float,
    content_weight: float,
    compute_dtype=None,
    max_iter: int = 20,
    history_size: int = 100,
    history_math: str = "compact",
    init_pixels=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The reference's exact optimizer contract: ``steps`` torch-LBFGS
    ``.step(closure)`` calls, each up to ``max_iter`` fixed-step inner
    iterations with persistent history (network.py:435 + torch defaults).

    A batched ``content_image`` ([N > 1, H, W, 3]) runs N **independent**
    optimizers via ``vmap`` — per-image history, step size, and tolerance
    breaks, exactly as N separate torch runs (curvature dot-products must
    not mix images). Total history memory is identical to one coupled
    problem (N x [H, n_img] = [H, N*n_img]); the returned loss history is
    the per-step mean over images.

    ``init_pixels`` warm-starts the optimization (coarse-to-fine); the
    content target stays ``content_image``. Default (None) starts from the
    content image like the reference (network.py:429)."""
    from styletransfer_tpu.ops.lbfgs import lbfgs_torch

    shape = content_image.shape
    init = content_image if init_pixels is None else init_pixels

    def run_one(img_flat: jnp.ndarray, content_flat: jnp.ndarray,
                sub_shape, math, branchless=False):
        content_i = content_flat.reshape(sub_shape).astype(content_image.dtype)
        loss_fn = make_loss_fn(
            vgg_params, content_i, style_grams, style_weight, content_weight,
            compute_dtype=compute_dtype,
        )

        def flat_loss_and_grad(x_flat):
            return jax.value_and_grad(
                lambda x: loss_fn(x.reshape(sub_shape))
            )(x_flat)

        return lbfgs_torch(
            flat_loss_and_grad,
            img_flat,
            steps=steps,
            max_iter=max_iter,
            history_size=history_size,
            history_math=math,
            branchless=branchless,
        )

    if shape[0] > 1:
        # Two vmap adaptations, both numerics-preserving (measured in
        # docs/performance.md): the compact history swaps to its
        # static-index shift form (per-lane traced slot indices lower to
        # scatter/gather — 4.5x inner-iteration blowup), and the closure
        # eval runs branchless (a batched-predicate lax.cond degrades the
        # scan body 2.2x even though both forms evaluate once).
        math = "compact_shift" if history_math == "compact" else history_math
        flat0 = init.reshape(shape[0], -1).astype(jnp.float32)
        cflat = content_image.reshape(shape[0], -1)
        x, losses = jax.vmap(
            functools.partial(
                run_one, sub_shape=(1,) + shape[1:], math=math,
                branchless=True,
            )
        )(flat0, cflat)
        return x.reshape(shape), jnp.mean(losses, axis=0)

    x, losses = run_one(
        init.reshape(-1).astype(jnp.float32), content_image.reshape(-1),
        sub_shape=shape, math=history_math,
    )
    return x.reshape(shape), losses


@functools.partial(
    jax.jit,
    static_argnames=("steps", "style_weight", "content_weight", "compute_dtype"),
)
def _run_lbfgs(
    vgg_params,
    content_image,
    style_grams,
    steps: int,
    style_weight: float,
    content_weight: float,
    compute_dtype=None,
    init_pixels=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    shape = content_image.shape
    init = content_image if init_pixels is None else init_pixels

    def run_one(pixels0: jnp.ndarray, content0: jnp.ndarray, sub_shape):
        pixels0 = pixels0.reshape(sub_shape)
        loss_fn = make_loss_fn(
            vgg_params, content0.reshape(sub_shape), style_grams,
            style_weight, content_weight,
            compute_dtype=compute_dtype,
        )
        opt = optax.lbfgs()
        opt_state0 = opt.init(pixels0)
        value_and_grad = optax.value_and_grad_from_state(loss_fn)

        def step(carry, _):
            pixels, opt_state = carry
            loss, grads = value_and_grad(pixels, state=opt_state)
            updates, opt_state = opt.update(
                grads, opt_state, pixels, value=loss, grad=grads,
                value_fn=loss_fn,
            )
            pixels = optax.apply_updates(pixels, updates)
            return (pixels, opt_state), loss

        (pixels, _), losses = jax.lax.scan(
            step, (pixels0, opt_state0), None, length=steps
        )
        return pixels, losses

    # Batched contents run as independent optimizations (per-image
    # linesearch and curvature history), like _run_lbfgs_torch.
    if shape[0] > 1:
        pixels, losses = jax.vmap(
            functools.partial(run_one, sub_shape=(1,) + shape[1:])
        )(init.reshape(shape[0], -1), content_image.reshape(shape[0], -1))
        return pixels.reshape(shape), jnp.mean(losses, axis=0)

    return run_one(init.reshape(-1), content_image.reshape(-1),
                   sub_shape=shape)


@functools.partial(
    jax.jit,
    static_argnames=(
        "steps", "style_weight", "content_weight", "learning_rate",
        "optimizer", "compute_dtype", "history_size", "history_math",
    ),
)
def _run_serve_batched(
    vgg_params,
    contents: jnp.ndarray,
    grams,
    steps: int,
    style_weight: float,
    content_weight: float,
    learning_rate: float,
    optimizer: str,
    compute_dtype=None,
    history_size: int = 100,
    history_math: str = "compact",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mixed-style batched Gatys for the serving daemon: lane ``i``
    optimizes ``contents[i]`` against its OWN Gram targets ``grams`` lane
    ``i`` (a pytree with a leading [B] axis over the usual [1, C, C]
    targets).

    The single-style batched paths (`_run_lbfgs_torch` / `_run_lbfgs`
    with N > 1 contents) share one ``style_grams`` across lanes; here the
    targets are per-lane data, so one compiled program serves a request
    group mixing arbitrary styles. Lanes are fully independent vmapped
    optimizers, with the same vmap adaptations those paths use
    (compact_shift history, branchless closure eval — measured in
    docs/performance.md). Returns ``(pixels [B, H, W, 3],
    per-lane loss histories [B, steps])`` — per-lane, NOT the mean, since
    each daemon response carries its own final loss.
    """
    from styletransfer_tpu.ops.lbfgs import lbfgs_torch

    if optimizer not in _OPTIMIZERS:
        raise ValueError(
            f"unknown optimizer {optimizer!r}; use one of {', '.join(_OPTIMIZERS)}"
        )
    shape = contents.shape
    sub_shape = (1,) + shape[1:]

    def lane(content_flat: jnp.ndarray, grams_i):
        content_i = content_flat.reshape(sub_shape).astype(contents.dtype)
        loss_fn = make_loss_fn(
            vgg_params, content_i, grams_i, style_weight, content_weight,
            compute_dtype=compute_dtype,
        )

        if optimizer == "adam":
            opt = optax.adam(learning_rate)

            def step(carry, _):
                x, opt_state = carry
                loss, grads = jax.value_and_grad(
                    lambda f: loss_fn(f.reshape(sub_shape))
                )(x)
                updates, opt_state = opt.update(grads, opt_state, x)
                return (optax.apply_updates(x, updates), opt_state), loss

            (x, _), losses = jax.lax.scan(
                step, (content_flat, opt.init(content_flat)), None, length=steps
            )
            return x, losses

        if optimizer == "lbfgs":

            def flat_loss_and_grad(x_flat):
                return jax.value_and_grad(
                    lambda x: loss_fn(x.reshape(sub_shape))
                )(x_flat)

            math = "compact_shift" if history_math == "compact" else history_math
            return lbfgs_torch(
                flat_loss_and_grad, content_flat,
                steps=steps, max_iter=20, history_size=history_size,
                history_math=math, branchless=True,
            )

        # lbfgs-zoom
        loss_flat = lambda f: loss_fn(f.reshape(sub_shape))  # noqa: E731
        opt = optax.lbfgs()
        value_and_grad = optax.value_and_grad_from_state(loss_flat)

        def step(carry, _):
            x, opt_state = carry
            loss, grads = value_and_grad(x, state=opt_state)
            updates, opt_state = opt.update(
                grads, opt_state, x, value=loss, grad=grads,
                value_fn=loss_flat,
            )
            return (optax.apply_updates(x, updates), opt_state), loss

        (x, _), losses = jax.lax.scan(
            step, (content_flat, opt.init(content_flat)), None, length=steps
        )
        return x, losses

    flat0 = contents.reshape(shape[0], -1).astype(jnp.float32)
    x, losses = jax.vmap(lane)(flat0, grams)
    return x.reshape(shape).astype(contents.dtype), losses


_OPTIMIZERS = ("adam", "lbfgs", "lbfgs-zoom")


def _run_optimizer(
    optimizer: str,
    vgg_params,
    content_image,
    style_grams,
    steps: int,
    style_weight: float,
    content_weight: float,
    learning_rate: float = 0.05,
    compute_dtype=None,
    history_size: int = 100,
    history_math: str = "compact",
    init_pixels=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The one optimizer-name -> jitted-program dispatch, shared by
    ``train_gatys`` and the serving daemon (three hand-synced copies of
    this mapping is how argument drift happens)."""
    if optimizer == "adam":
        return _run_adam(
            vgg_params, content_image, style_grams, steps,
            float(style_weight), float(content_weight), float(learning_rate),
            compute_dtype=compute_dtype, init_pixels=init_pixels,
        )
    if optimizer == "lbfgs":
        return _run_lbfgs_torch(
            vgg_params, content_image, style_grams, steps,
            float(style_weight), float(content_weight),
            compute_dtype=compute_dtype, history_size=history_size,
            history_math=history_math, init_pixels=init_pixels,
        )
    if optimizer == "lbfgs-zoom":
        return _run_lbfgs(
            vgg_params, content_image, style_grams, steps,
            float(style_weight), float(content_weight),
            compute_dtype=compute_dtype, init_pixels=init_pixels,
        )
    raise ValueError(
        f"unknown optimizer {optimizer!r}; use one of {', '.join(_OPTIMIZERS)}"
    )


def train_gatys(
    vgg_params,
    style_image: jnp.ndarray,
    content_image: jnp.ndarray,
    steps: int = 550,
    style_weight: float = 100_000.0,
    content_weight: float = 1.0,
    optimizer: str = "lbfgs",
    learning_rate: float = 0.05,
    log_every: Optional[int] = 50,
    precision: str = "f32",
    history_size: int = 100,
    history_math: str = "compact",
    coarse_steps: int = 0,
    coarse_scale: float = 0.5,
    style_grams=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stylize ``content_image`` with the style of ``style_image``.

    ``style_grams`` overrides the Gram targets (``style_image`` is then
    ignored and may be None) — used for style blends (``blend_grams``)
    or precomputed targets.

    Drop-in equivalent of ``train_gatys``, with the reference's *method*
    defaults: steps=550 and L-BFGS over the pixels (network.py:413, 435).
    The CLI layer passes steps=300 by default, mirroring the reference CLI
    (clis/gatys_st.py:14). With the default ``lbfgs`` each step is a full
    torch ``optimizer.step(closure)`` — up to 20 inner L-BFGS iterations —
    so the *iteration count contract matches the reference exactly*.
    Returns ``(image, loss_history)`` where ``image`` is NHWC in normalized
    space and ``loss_history`` has one entry per optimizer step.

    ``content_image`` may be batched ([N, H, W, 3]): the whole batch
    optimizes in one compiled program against the same style, and every
    batch element follows its fully independent trajectory. Adam is
    per-pixel by construction; both L-BFGS variants ``vmap`` N separate
    optimizers (per-image curvature history, step size, linesearch, and
    tolerance breaks) — a single coupled flat-vector L-BFGS would mix
    images through the history dot-products and diverge from N
    reference runs.

    The optimization itself never leaves the device; ``log_every`` only
    controls post-hoc logging of the returned loss history (the reference
    logs every closure, network.py:453 — a device->host sync per step we
    deliberately avoid).

    ``coarse_steps > 0`` enables **coarse-to-fine** (beyond the reference,
    default off): first optimize ``coarse_steps`` steps at
    ``coarse_scale`` × resolution, bilinearly upsample the result, and use
    it to warm-start the full-resolution run. The style Gram targets are
    resolution-independent ([C, C] per tap, already H·W-normalized —
    ops/losses.py), so both stages share them; the content target is
    re-derived at each stage's own resolution. Full-res optimizer
    iterations dominate cost (a half-res step is ~4× cheaper), so spending
    early exploration at low resolution buys the same final quality in
    fewer full-res steps — the trajectory is NOT the reference's
    (different init), which is why the default stays 0.
    """
    logger = get_logger()
    if style_grams is None:
        style_grams = vgg.style_gram_targets(vgg_params, style_image)
    # bf16 runs the VGG tower with bfloat16 activations (pixels, grams, and
    # the Adam state stay float32); the loss landscape is indistinguishable
    # at these weights and the tower is the entire per-step cost.
    compute_dtype = jnp.bfloat16 if precision == "bf16" else None

    init_pixels = None
    if coarse_steps > 0:
        n, h, w, c = content_image.shape
        # Multiples of 8 keep the coarse tower's tiles lane-aligned; the
        # 5 VGG pools floor odd sizes anyway, so any size is legal.
        ch = max(32, int(h * coarse_scale) // 8 * 8)
        cw = max(32, int(w * coarse_scale) // 8 * 8)
        small = jax.image.resize(
            content_image, (n, ch, cw, c), method="linear")
        coarse_px, coarse_losses = _run_optimizer(
            optimizer, vgg_params, small, style_grams, coarse_steps,
            style_weight, content_weight, learning_rate,
            compute_dtype=compute_dtype, history_size=history_size,
            history_math=history_math,
        )
        init_pixels = jax.image.resize(
            coarse_px, content_image.shape, method="linear"
        ).astype(content_image.dtype)
        if log_every:
            logger.info(
                "Gatys coarse stage (%dx%d, %d steps) final loss: %.6f",
                ch, cw, coarse_steps,
                float(jax.device_get(coarse_losses)[-1]),
            )

    pixels, losses = _run_optimizer(
        optimizer, vgg_params, content_image, style_grams, steps,
        style_weight, content_weight, learning_rate,
        compute_dtype=compute_dtype, history_size=history_size,
        history_math=history_math, init_pixels=init_pixels,
    )

    losses = jax.device_get(losses)
    if log_every:
        for i in range(0, steps, log_every):
            logger.info("Gatys step %d  loss: %.6f", i, float(losses[i]))
        logger.info("Gatys final loss: %.6f", float(losses[-1]))
    return pixels, losses


def parse_style_spec(spec: str, root: Optional[str] = None):
    """STYLE spec -> (paths, normalized weights).

    ``a.png`` is the plain single style; ``a.png,b.png[:0.3,0.7]``
    requests a BLEND — the target Gram matrices become the weighted
    average of the styles' (equal weights when omitted; normalized here).
    Shared by the serving daemon's STYLE field and the one-shot CLI's
    STYLE-IMAGE-PATH argument. Raises ValueError on malformed specs.

    Escape hatch: a path that LOOKS like a blend spec but names an
    existing file (commas and colons are legal in POSIX filenames) is
    taken literally — pass ``root`` so relative paths resolve the same
    way the caller will load them. Blend syntax therefore cannot shadow
    a real single-style file.
    """
    if "," in spec or ":" in spec:
        literal = os.path.join(root, spec) if root else spec
        if os.path.isfile(literal):
            return [spec], [1.0]
    paths_part, sep, w_part = spec.partition(":")
    paths = [p for p in paths_part.split(",") if p]
    if not paths:
        raise ValueError(f"empty STYLE spec {spec!r}")
    if not sep and len(paths) == 1:
        return paths, [1.0]
    if w_part:
        try:
            ws = [float(x) for x in w_part.split(",")]
        except ValueError:
            raise ValueError(
                f"bad blend weights {w_part!r} (want e.g. 0.3,0.7)")
        if len(ws) != len(paths):
            raise ValueError(
                f"{len(paths)} style paths but {len(ws)} weights")
        import math

        total = sum(ws)
        # isfinite: every comparison against NaN is False, so 'nan,1'
        # would pass the <=0/<0 checks and burn a full optimization on
        # all-NaN Gram targets before anyone noticed.
        if (not all(map(math.isfinite, ws)) or total <= 0
                or any(w < 0 for w in ws)):
            raise ValueError(
                f"blend weights must be finite and >= 0 with a positive "
                f"sum, got {w_part!r}")
        ws = [w / total for w in ws]
    else:
        ws = [1.0 / len(paths)] * len(paths)
    return paths, ws


def blend_grams(gram_list, weights):
    """Weighted average of per-style Gram-target pytrees (style
    interpolation: targets are data, so blends never recompile)."""
    if len(gram_list) == 1 and weights[0] == 1.0:
        return gram_list[0]
    return jax.tree.map(
        lambda *gs: sum(w * g for w, g in zip(weights, gs)), *gram_list
    )


def serve_loop(
    steps: int = 300,
    style_weight: float = 100_000.0,
    content_weight: float = 1.0,
    optimizer: str = "lbfgs",
    learning_rate: float = 0.05,
    history_size: int = 100,
    history_math: str = "compact",
    precision: str = "f32",
    size: Optional[int] = None,
    out_dir: str = "results/",
    batch: int = 1,
    vgg_params=None,
    stdin=None,
    stdout=None,
) -> int:
    """Warm-process Gatys daemon: repeated optimizations without recompiles.

    The Gatys optimizer program (a scan of L-BFGS steps, each a scan of
    inner iterations under the torch contract) is the most expensive
    compile in the framework — and both the content pixels AND the style's
    Gram targets are pure DATA to it. One warm process therefore serves
    arbitrary (content, style) pairs: per request it runs one jitted VGG
    pass for the style's Gram targets and one jitted optimization, both
    compiled exactly once at startup.

    Protocol (line-oriented; see ``engines.daemon``): each request line is
    ``CONTENT\\tSTYLE[\\tOUTPUT]``; empty OUTPUT means
    ``{out_dir}/gatys_{content_stem}_{style_stem}.png``. STYLE may also be
    a BLEND spec ``a.png,b.png[:0.3,0.7]`` — the target Grams are the
    weighted average of the styles' (normalized server-side, equal when
    omitted); blends are pure data, so they recompile nothing and reuse
    the per-style Gram cache. Responses:
    ``READY`` after the warm-up compile, then per request
    ``OK <out_path> loss=<final_loss>`` or ``ERR <input>: <reason>``.
    The optimizer/steps/weights are fixed per daemon (they are compiled
    into the program); start one daemon per configuration.

    ``batch > 1`` turns on dynamic batching (engines/daemon.py): pending
    requests group into ONE vmapped device call of independent lanes —
    each with its own per-lane Gram targets, so a group may mix styles
    (`_run_serve_batched`). A lone request routes to the single-lane
    program rather than padding the group: under the torch-contract
    L-BFGS a batch of N costs ~N x one image (history HBM traffic adds
    linearly — docs/performance.md), so padded lanes would be pure waste;
    ragged groups of 2+ pad to the one compiled shape. Batching buys
    Adam / lbfgs-zoom near-linear throughput, and for the contract
    optimizer amortized per-request overhead. Style Gram targets are
    LRU-cached across requests (keyed by path + mtime).

    The reference runs one optimization per process (network.py:413-455);
    this is the daemon form of that CLI contract.
    """
    import sys as _sys
    from collections import OrderedDict

    import numpy as np

    from styletransfer_tpu import constants
    from styletransfer_tpu.engines import daemon
    from styletransfer_tpu.utils import images as img_utils

    logger = get_logger()
    stdout = stdout if stdout is not None else _sys.stdout

    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    if vgg_params is None:
        vgg_params = vgg.load_params()
    compute_dtype = jnp.bfloat16 if precision == "bf16" else None
    sz = size or constants.IMSIZE
    out_dir = os.path.join(constants.PROJECT_ROOT_PATH, out_dir)
    os.makedirs(out_dir, exist_ok=True)

    grams_fn = jax.jit(vgg.style_gram_targets)

    # Style Gram targets are pure functions of (path, mtime): a daemon
    # hammering one or a few styles skips their VGG pass entirely.
    _gram_cache: "OrderedDict" = OrderedDict()

    def style_grams_cached(style_path: str):
        full = os.path.join(constants.PROJECT_ROOT_PATH, style_path)
        key = (full, os.path.getmtime(full))
        if key in _gram_cache:
            _gram_cache.move_to_end(key)
            return _gram_cache[key]
        style = jnp.asarray(img_utils.load_image(full, size=sz))
        grams = grams_fn(vgg_params, style)
        _gram_cache[key] = grams
        while len(_gram_cache) > 16:
            _gram_cache.popitem(last=False)
        return grams

    def style_grams_for_spec(spec: str):
        # Blends (parse_style_spec) cost one cached VGG pass per distinct
        # style and zero recompiles — the Gatys analogue of serve-multi's
        # blend-as-data requests.
        paths, ws = parse_style_spec(spec, root=constants.PROJECT_ROOT_PATH)
        return blend_grams([style_grams_cached(p) for p in paths], ws)

    def style_stem(spec: str) -> str:
        paths, ws = parse_style_spec(spec, root=constants.PROJECT_ROOT_PATH)
        stem = "+".join(
            os.path.splitext(os.path.basename(p))[0] for p in paths
        )
        if len(paths) > 1:
            # Distinct blends of the same styles must not share a default
            # output name (one would silently overwrite the other); the
            # weights are normalized, so equivalent specs (0.9,0.1 vs 9,1)
            # still collapse to one name.
            stem += "_" + "_".join(f"{w:g}" for w in ws)
        return stem

    def optimize(content, grams):
        return _run_optimizer(
            optimizer, vgg_params, content, grams, steps,
            style_weight, content_weight, learning_rate,
            compute_dtype=compute_dtype, history_size=history_size,
            history_math=history_math,
        )

    # Multi-chip serving: the group's lanes are fully independent, so the
    # lane axis shards over the serving mesh — N chips run N optimizations
    # at single-image latency. Per-lane Gram targets shard WITH their
    # lanes; VGG params replicate. One device = plain placement
    # (parallel/mesh.py:serving_placement).
    from styletransfer_tpu.parallel import mesh as mesh_lib

    if batch > 1:
        vgg_params, place, _, _ = mesh_lib.serving_placement(batch, vgg_params)

    def place_group(contents, grams_stacked):
        return place(jnp.asarray(contents)), place(grams_stacked)

    def optimize_batched(contents, grams_stacked):
        return _run_serve_batched(
            vgg_params, contents, grams_stacked, steps,
            float(style_weight), float(content_weight), float(learning_rate),
            optimizer, compute_dtype=compute_dtype,
            history_size=history_size, history_math=history_math,
        )

    # Warm-up: compile the gram pass AND the optimization(s) at the fixed
    # shapes so READY means ready (the persistent cache makes this cheap
    # after the first-ever process with this configuration). With dynamic
    # batching BOTH shapes compile: lone requests route to the single-lane
    # program (padding a group of 1 to `batch` would cost ~batch x one
    # image under the contract optimizer), ragged groups pad to `batch`.
    t0 = time.time()
    warm = jnp.zeros((1, sz, sz, 3), jnp.float32)
    warm_grams = grams_fn(vgg_params, warm)
    out, losses = optimize(warm, warm_grams)
    float(jnp.sum(out))  # force completion (axon ignores block_until_ready)
    if batch > 1:
        warm_b, warm_grams_b = place_group(
            np.zeros((batch, sz, sz, 3), np.float32),
            jax.tree.map(lambda g: jnp.stack([g] * batch), warm_grams),
        )
        out_b, _ = optimize_batched(warm_b, warm_grams_b)
        float(jnp.sum(out_b))
    logger.info(
        "gatys serve: compiled %dpx %s %s (steps=%d, batch=%d) in %.1fs; ready",
        sz, precision, optimizer, steps, batch, time.time() - t0,
    )
    print("READY", file=stdout, flush=True)

    def parse_and_load(fields):
        """One request line -> (content_path, style_path, explicit_out,
        content [1,H,W,3], grams). Raises on malformed lines / bad files."""
        if fields[0] in ("RELOAD", "RESET"):
            # Answer intelligibly instead of "No such file: RELOAD".
            raise ValueError(
                f"the gatys daemon has no {fields[0]}: requests are "
                "stateless and there is no checkpoint; start a new daemon "
                "to change configuration"
            )
        if not 2 <= len(fields) <= 3 or not fields[1]:
            raise ValueError("expected CONTENT\\tSTYLE[\\tOUTPUT]")
        content_path, style_path = fields[0], fields[1]
        explicit_out = fields[2] if len(fields) > 2 else ""
        content = np.asarray(img_utils.load_image(
            os.path.join(constants.PROJECT_ROOT_PATH, content_path), size=sz
        ))
        return (content_path, style_path, explicit_out, content,
                style_grams_for_spec(style_path))

    def save_one(content_path, style_path, explicit_out, pixels, final):
        cstem = os.path.splitext(os.path.basename(content_path))[0]
        sstem = style_stem(style_path)
        out_file = daemon.resolve_out_path(
            explicit_out, out_dir, f"gatys_{cstem}_{sstem}.png"
        )
        img_utils.save_image(np.asarray(pixels), out_file)
        return f"{out_file} loss={float(final):.4f}"

    def handle(*fields):
        content_path, style_path, explicit_out, content, grams = (
            parse_and_load(fields)
        )
        pixels, losses = optimize(jnp.asarray(content), grams)
        return save_one(
            content_path, style_path, explicit_out, pixels,
            np.asarray(losses)[-1],
        )

    if batch == 1:
        return daemon.run_request_loop(
            handle, stdin=stdin, stdout=stdout, name="gatys serve"
        )

    def handle_batch(requests):
        results: list = [None] * len(requests)
        lanes = []  # (request index, content_path, style_path, out, content, grams)
        for i, fields in enumerate(requests):
            try:
                lanes.append((i,) + parse_and_load(fields))
            except Exception as exc:  # noqa: BLE001
                results[i] = exc
        if not lanes:
            return results
        if len(lanes) == 1:
            # A lone SURVIVING lane (lone request, or the rest of its group
            # failed to parse/load) takes the single-lane program: padding
            # one lane to `batch` costs ~batch x one image under the
            # contract optimizer.
            i, content_path, style_path, explicit_out, content, grams = lanes[0]
            try:
                pixels, losses = optimize(jnp.asarray(content), grams)
                results[i] = save_one(
                    content_path, style_path, explicit_out, pixels,
                    np.asarray(losses)[-1],
                )
            except Exception as exc:  # noqa: BLE001 - per-request containment
                results[i] = exc
            return results
        contents = np.concatenate([l[4] for l in lanes])
        grams_stacked = jax.tree.map(
            lambda *gs: jnp.concatenate(gs)[:, None], *[l[5] for l in lanes]
        )
        pad = batch - len(lanes)
        if pad:
            contents = np.concatenate(
                [contents, np.repeat(contents[-1:], pad, axis=0)]
            )
            grams_stacked = jax.tree.map(
                lambda g: jnp.concatenate([g, jnp.repeat(g[-1:], pad, axis=0)]),
                grams_stacked,
            )
        try:
            contents_dev, grams_stacked = place_group(contents, grams_stacked)
            pixels, losses = optimize_batched(contents_dev, grams_stacked)
            pixels = np.asarray(pixels)
            finals = np.asarray(losses)[:, -1]
        except Exception as exc:  # noqa: BLE001 - keep parse-specific ERRs
            for lane in lanes:
                results[lane[0]] = exc
            return results
        for k, (i, content_path, style_path, explicit_out, _, _) in enumerate(lanes):
            try:
                results[i] = save_one(
                    content_path, style_path, explicit_out,
                    pixels[k:k + 1], finals[k],
                )
            except Exception as exc:  # noqa: BLE001
                results[i] = exc
        return results

    return daemon.run_batched_request_loop(
        handle_batch, batch, stdin=stdin, stdout=stdout, name="gatys serve"
    )
