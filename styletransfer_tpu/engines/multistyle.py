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
import os
import time
from typing import Dict, Optional, Tuple

import jax
import numpy as np
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


def make_eval_step(
    vgg_params, style_grams: Dict[str, jnp.ndarray],
    style_weight: float = 100_000.0, feature_weight: float = 1.0,
    compute_dtype=None,
):
    """Jitted multi-style eval: style + feature loss on the clamped output
    with per-sample style selection — the multi-style analogue of
    ``static_test`` (network.py:772-796), same clamp quirk included."""

    @jax.jit
    def eval_step(params, batch, style_idx):
        batch = img_utils.maybe_normalize_on_device(batch)
        transformed = multistyle.apply(params, batch, style_idx, compute_dtype)
        clamped = jnp.clip(transformed, 0.0, 255.0)
        feats = vgg.extract_features(
            vgg_params, clamped, vgg.STYLE_LAYERS, compute_dtype
        )
        s_loss = jnp.float32(0.0)
        for name in vgg.STYLE_LAYERS:
            g = losses.gram_matrix(feats[name])
            tgt = style_grams[name][style_idx]
            s_loss = s_loss + jnp.mean(jnp.square(g - tgt))
        f_loss = vgg.feature_loss(vgg_params, clamped, batch, compute_dtype=compute_dtype)
        return style_weight * s_loss + feature_weight * f_loss

    return eval_step


def train(
    style_images: jnp.ndarray,
    style_name: str = "multi",
    epochs: int = 50,
    batch_size: int = 4,
    style_weight: float = 100_000.0,
    content_weight: float = 1.0,
    mesh=None,
    vgg_params=None,
    params=None,
    train_loader=None,
    test_loader=None,
    seed: int = 0,
    log_cadence: Tuple[int, int, int] = (20, 50, 150),
    runs_dir: Optional[str] = None,
    models_path: Optional[str] = None,
    max_steps_per_epoch: Optional[int] = None,
    step_checkpoint_every: Optional[int] = None,
    precision: str = "f32",
):
    """Train one network on a stack of styles [S, H, W, 3].

    Each batch element draws a uniform-random style index per step. Full
    parity with ``static_train``'s training contract (mirrored from
    engines/fast.py): TB scalars/images/eval at the reference cadences
    (20/50/150 — network.py:733-761), per-epoch checkpoint/resume under the
    model name ``fast_multi_st``, and optional atomic mid-epoch step states.
    Returns the trained params.
    """
    from styletransfer_tpu import ckpt, constants
    from styletransfer_tpu.data import coco
    from styletransfer_tpu.parallel import mesh as mesh_lib
    from styletransfer_tpu.parallel import prefetch
    from styletransfer_tpu.utils import tb
    from styletransfer_tpu.utils.logging import get_logger

    logger = get_logger()
    mesh = mesh or mesh_lib.auto_mesh(batch_size)
    compute_dtype = jnp.bfloat16 if precision == "bf16" else None
    scalar_every, image_every, eval_every = log_cadence

    writer = tb.get_tensorboard_writer(
        runs_dir
        or os.path.join(
            constants.RUNS_PATH, f"fast-image-style-transfer-multi_{style_name}"
        )
    )

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
    eval_step = make_eval_step(
        vgg_params, grams, style_weight, compute_dtype=compute_dtype
    )
    opt_state = mesh_lib.replicate(opt.init(params), mesh)

    if train_loader is None or test_loader is None:
        from styletransfer_tpu.parallel import distributed

        proc_idx, proc_cnt = distributed.process_info()
        made_test, made_train = coco.get_coco_loader(
            batch_size=distributed.local_batch_size(batch_size),
            test_split=0.10, test_limit=20, seed=seed,
            shard_index=proc_idx, shard_count=proc_cnt,
        )
        train_loader = train_loader or made_train
        test_loader = test_loader or made_test

    logger.info(
        "Training fast_multi_st (%d styles) with Adam on a %d-device mesh",
        n_styles, mesh.size,
    )

    rng = np.random.default_rng(seed)
    iteration = 0
    start_epoch = 0
    resume_batches = 0
    if step_checkpoint_every:
        from styletransfer_tpu.parallel import distributed

        state = ckpt.load_step_state(
            jax.device_get(params), jax.device_get(opt_state),
            MODEL_NAME, style_name, models_path,
            extra_keys=("batch_in_epoch",),
        )
        # Collective resume check (see fast.static_train): mismatched
        # step states across hosts must degrade everyone together.
        state = distributed.agree_resume_state(state)
        if state is not None:
            params = mesh_lib.replicate(state["params"], mesh)
            opt_state = mesh_lib.replicate(state["opt_state"], mesh)
            start_epoch = int(state["epoch"])
            iteration = int(state["iteration"])
            resume_batches = int(state["extra"].get("batch_in_epoch", 0))
            if resume_batches and hasattr(train_loader, "set_position"):
                train_loader.set_position(start_epoch, resume_batches)
            elif resume_batches:
                logger.warning(
                    "Loader %s has no set_position; the resumed epoch "
                    "replays its first %d batches.",
                    type(train_loader).__name__, resume_batches,
                )
                resume_batches = 0
            if start_epoch >= epochs:
                logger.warning(
                    "Step state is at epoch %d >= requested epochs %d — "
                    "nothing to train. Delete %s to retrain from scratch.",
                    start_epoch, epochs,
                    ckpt.step_state_path(MODEL_NAME, style_name, models_path),
                )

    def eval_indices(batch_len: int) -> jnp.ndarray:
        # Deterministic round-robin so every style is evaluated each pass.
        return jnp.arange(batch_len, dtype=jnp.int32) % n_styles

    for epoch in range(start_epoch, epochs):
        if ckpt.epoch_checkpoint_exists(MODEL_NAME, style_name, epoch, models_path):
            # Load THIS epoch's own file (the reference's per-epoch resume,
            # network.py:681-685) — the overall-latest could be a later epoch.
            params = ckpt.load(
                ckpt.existing_checkpoint_path(
                    MODEL_NAME, style_name, epoch, models_path
                ),
                params,
            )
            params = mesh_lib.replicate(params, mesh)
            opt_state = mesh_lib.replicate(opt.init(params), mesh)
            logger.info("Epoch %d checkpoint exists; skipping", epoch)
            continue

        logger.info("Starting multi-style epoch %d (%d styles)", epoch, n_styles)
        t0 = time.time()
        n_in_epoch = 0
        epoch_offset = resume_batches if epoch == start_epoch else 0
        resume_batches = 0
        # lockstep: per-host batch counts can differ by one (uneven corpus
        # shards) — all hosts must stop together (parallel/distributed).
        from styletransfer_tpu.parallel import distributed

        for batch in distributed.lockstep(
            prefetch.prefetch_to_device(train_loader, mesh)
        ):
            idx = mesh_lib.shard_batch(
                rng.integers(0, n_styles, batch.shape[0]).astype(np.int32), mesh
            )
            params, opt_state, metrics = train_step(params, opt_state, batch, idx)

            if iteration % scalar_every == 0:
                total = float(metrics["total"])
                writer.add_scalar("data/fst_train_loss", total, iteration)
                logger.info("Batch Loss: %.8f", total)
            if iteration % eval_every == 0:
                evals = []
                for test_batch in distributed.lockstep(test_loader):
                    test_batch = mesh_lib.shard_batch(test_batch, mesh)
                    test_idx = mesh_lib.shard_batch(
                        np.asarray(eval_indices(test_batch.shape[0])), mesh
                    )
                    evals.append(float(eval_step(params, test_batch, test_idx)))
                avg = float(np.mean(evals)) if evals else float("nan")
                logger.info("Average test loss: %.8f", avg)
                writer.add_scalar("data/fst_test_loss", avg, iteration)
            if iteration % image_every == 0 and jax.process_count() == 1:
                # (Multi-host runs skip image previews — see engines/fast.py.)
                preview_in = img_utils.maybe_normalize_on_device(batch[:1])
                preview = stylize(
                    params, preview_in,
                    jnp.asarray([iteration % n_styles], dtype=jnp.int32),
                    compute_dtype=compute_dtype,
                )
                pair = img_utils.concat_images(
                    img_utils.to_uint8(np.asarray(preview)),
                    img_utils.to_uint8(np.asarray(preview_in)),
                    axis=1,
                )
                writer.add_image("data/fst_images", pair, iteration)

            iteration += 1
            n_in_epoch += 1
            if step_checkpoint_every and iteration % step_checkpoint_every == 0:
                ckpt.save_step_state(
                    params, opt_state, epoch, iteration,
                    MODEL_NAME, style_name, models_path,
                    extra={"batch_in_epoch": epoch_offset + n_in_epoch},
                )
            if max_steps_per_epoch and n_in_epoch >= max_steps_per_epoch:
                break

        dt = time.time() - t0
        if n_in_epoch:
            logger.info(
                "Epoch %d: %d steps in %.1fs (%.2f img/s)",
                epoch, n_in_epoch, dt, n_in_epoch * batch_size / dt,
            )
        ckpt.save_epoch(params, MODEL_NAME, style_name, epoch, models_path)
        if step_checkpoint_every:
            # Keep the step state ahead of the epoch checkpoint so a crash
            # right after an epoch save resumes with the *current* optimizer
            # moments instead of the epoch-skip path re-initializing them.
            ckpt.save_step_state(
                params, opt_state, epoch + 1, iteration,
                MODEL_NAME, style_name, models_path,
                extra={"batch_in_epoch": 0},
            )

    writer.close()
    return params


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def stylize(params, images, style_idx, compute_dtype=None):
    """Stylize a batch with per-sample hard style selection."""
    return multistyle.apply(params, images, style_idx, compute_dtype)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def stylize_blend(params, images, weights, compute_dtype=None):
    """Stylize a batch with per-sample convex style blends [B, S]."""
    return multistyle.apply_blend(params, images, weights, compute_dtype)


def _make_style_parser(num_styles: int):
    """Request STYLE spec -> ([num_styles] convex weights, filename tag).

    Module-level (not a serve_loop closure) so the validation — including
    the non-finite rejection — is directly testable."""

    def parse_style(style_spec):
        style_spec = style_spec or "0"
        if "," in style_spec:
            w = np.asarray(
                [float(v) for v in style_spec.split(",")], np.float32
            )
            if w.shape[0] != num_styles:
                raise ValueError(
                    f"expected {num_styles} blend weights, got {w.shape[0]}"
                )
            # isfinite: NaN compares False against everything, so
            # 'nan,1' would pass both checks and serve an all-NaN blend.
            if not np.isfinite(w).all() or w.min() < 0 or w.sum() <= 0:
                raise ValueError(
                    "blend weights must be finite and non-negative "
                    "with a positive sum")
            w = w / w.sum()
            return w, "blend_" + "_".join(f"{v:g}" for v in w)
        idx = int(style_spec)
        if not 0 <= idx < num_styles:
            raise ValueError(
                f"style index {idx} out of range [0, {num_styles})"
            )
        w = np.zeros((num_styles,), np.float32)
        w[idx] = 1.0
        return w, f"style{idx}"

    return parse_style


def serve_loop(
    name: str,
    num_styles: int,
    out_dir: str = "results/",
    params=None,
    models_path=None,
    size: Optional[int] = None,
    precision: str = "f32",
    batch_size: int = 1,
    sizes=None,
    stdin=None,
    stdout=None,
) -> int:
    """Warm-process multi-style serving: per-request style selection AND
    continuous blending from one compiled program.

    The daemon form of ``convert-image-multi`` (see ``fast.serve_loop`` for
    the rationale): every request carries its own style — a hard index or
    arbitrary convex blend weights — as DATA, so switching or interpolating
    styles costs nothing (hard selection is the one-hot special case of the
    blended conditional-IN affines; tested identical).

    Protocol (line-oriented, responses flushed): each request line is
    ``INPUT[\\tOUTPUT[\\tSTYLE[\\tSIZE]]]`` where STYLE is an index
    (``2``) or comma-separated blend weights (``0.3,0.7``, normalized
    server-side); empty OUTPUT means the default
    ``{out_dir}/converted_fast_multi_st_{name}_{stem}_{style}.png``.
    Missing STYLE means style 0. SIZE picks a resolution bucket when the
    daemon was started with ``sizes`` (CLI ``--sizes 256,512``; see
    ``fast.serve_loop`` — absent = first listed; an un-compiled size
    answers ``ERR``; batched groups run one device call per
    (bucket) present, styles still mixing freely as data). ``READY``
    after compile; per request ``OK <out_path>`` or
    ``ERR <input>: <reason>``; blank line / EOF shuts down. Returns the
    number served.
    """
    import sys as _sys

    from styletransfer_tpu import ckpt, constants
    from styletransfer_tpu.engines import daemon
    from styletransfer_tpu.parallel import mesh as mesh_lib
    from styletransfer_tpu.utils import images as img_utils
    from styletransfer_tpu.utils.logging import get_logger

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")

    logger = get_logger()
    stdout = stdout if stdout is not None else _sys.stdout

    if params is None:
        template = multistyle.init_params(
            jax.random.PRNGKey(0), num_styles=num_styles
        )
        params, _ = ckpt.load_latest_transformer(
            MODEL_NAME, name, template, models_path
        )

    cd = jnp.bfloat16 if precision == "bf16" else None

    @jax.jit
    def serve_fn(params, batch_u8, weights):
        x = img_utils.maybe_normalize_on_device(batch_u8)
        y = multistyle.apply_blend(params, x, weights, compute_dtype=cd)
        return img_utils.to_uint8_on_device(y)

    # Resolution buckets: one compiled program per size, first = default
    # (one shared contract: daemon.normalize_buckets).
    buckets = daemon.normalize_buckets(sizes, size or constants.IMSIZE)
    default_sz = buckets[0]
    out_dir = os.path.join(constants.PROJECT_ROOT_PATH, out_dir)
    os.makedirs(out_dir, exist_ok=True)

    # Multi-chip serving: batch AND the [B, S] per-request style weights
    # are data parallelism (parallel/mesh.py:serving_placement; one
    # device = plain placement).
    params, place, _, place_params = mesh_lib.serving_placement(
        batch_size, params
    )

    warm_w = np.tile(
        np.eye(1, num_styles, dtype=np.float32), (batch_size, 1)
    )
    for s in buckets:
        t0 = time.time()
        np.asarray(
            serve_fn(
                params, place(np.zeros((batch_size, s, s, 3), np.uint8)),
                place(warm_w),
            )
        )
        logger.info(
            "multi serve: compiled %dpx %s b%d program (%d styles) in %.1fs",
            s, precision, batch_size, num_styles, time.time() - t0,
        )
    logger.info("multi serve: ready (buckets: %s)", buckets)
    print("READY", file=stdout, flush=True)

    def resolve_bucket(fields) -> int:
        """Field-count contract + the optional SIZE field's bucket."""
        if len(fields) > 4:
            raise ValueError(
                "expected INPUT[\\tOUTPUT[\\tSTYLE[\\tSIZE]]], got "
                f"{len(fields)} fields"
            )
        if len(fields) == 4 and fields[3]:
            try:
                s = int(fields[3])
            except ValueError:
                raise ValueError(f"SIZE must be an integer, got {fields[3]!r}")
            if s not in buckets:
                raise ValueError(f"size {s} not in serving buckets {buckets}")
            return s
        return default_sz

    # Served params live in a cell so RELOAD can swap in a newer checkpoint
    # without recompiling (same pytree structure -> same jitted program).
    state = {"params": params}

    def reload():
        new, epoch = ckpt.load_latest_transformer(
            MODEL_NAME, name,
            multistyle.init_params(jax.random.PRNGKey(0), num_styles=num_styles),
            models_path,
        )
        state["params"] = place_params(new)
        return f"RELOAD epoch={epoch}"

    parse_style = _make_style_parser(num_styles)

    def save_one(in_path, explicit_out, tag, img):
        stem = os.path.splitext(os.path.basename(in_path))[0]
        out_file = daemon.resolve_out_path(
            explicit_out, out_dir,
            f"converted_fast_multi_st_{name}_{stem}_{tag}.png",
        )
        img_utils.save_uint8(img, out_file)
        return out_file

    if batch_size == 1:

        def handle(*fields):
            # Same field-count contract (and ERR text) as the batched
            # run_segment below — serial mode must not leak a TypeError.
            bucket = resolve_bucket(fields)
            in_path = fields[0]
            explicit_out = fields[1] if len(fields) > 1 else ""
            w, tag = parse_style(fields[2] if len(fields) > 2 else "0")
            input_u8 = img_utils.load_image_uint8(
                os.path.join(constants.PROJECT_ROOT_PATH, in_path), size=bucket
            )
            out_u8 = np.asarray(
                serve_fn(
                    state["params"], jnp.asarray(input_u8),
                    jnp.asarray(w)[None],
                )
            )[0]
            return save_one(in_path, explicit_out, tag, out_u8)

        return daemon.run_request_loop(
            handle, stdin=stdin, stdout=stdout, name="multi serve",
            commands={"RELOAD": reload},
        )

    # Shared batched-wave skeleton (daemon.make_pooled_segment_submit):
    # per-request styles are DATA ([B, S] blend weights), so a mixed group
    # of hard selections and blends runs as ONE device call; resolution
    # buckets are SHAPES, so the group splits per bucket.
    def decode(i, fields):
        try:
            bucket = resolve_bucket(fields)
            in_path = fields[0]
            w, tag = parse_style(fields[2] if len(fields) > 2 else "0")
            arr = img_utils.load_image_uint8(
                os.path.join(constants.PROJECT_ROOT_PATH, in_path),
                size=bucket,
            )[0]
            return i, bucket, (
                i, in_path, fields[1] if len(fields) > 1 else "",
                tag, w, arr,
            ), None
        except Exception as exc:  # noqa: BLE001 - answered per-request
            return i, None, None, exc

    def launch(bucket, metas):
        arr = np.stack([m[5] for m in metas])
        wb = np.stack([m[4] for m in metas])
        pad = batch_size - len(metas)
        if pad:
            arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
            wb = np.concatenate([wb, np.repeat(wb[-1:], pad, axis=0)])
        return serve_fn(state["params"], place(arr), place(wb))

    def save(meta, img):
        _, in_path, explicit_out, tag, _, _ = meta
        return save_one(in_path, explicit_out, tag, img)

    submit_segment = daemon.make_pooled_segment_submit(decode, launch, save)

    return daemon.run_batched_request_loop(
        None, batch_size, stdin=stdin, stdout=stdout, name="multi serve",
        submit_batch=daemon.segmented_submit_batch(
            submit_segment, {"RELOAD": reload}
        ),
    )
