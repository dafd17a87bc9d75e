"""Fast (feed-forward) style transfer: training, eval, and inference.

TPU-native rebuild of ``ImageTransformNet.static_train`` / ``static_test`` /
``process_image`` (network.py:651-832). Design changes vs. the reference:

- The whole optimization step (transform-net forward, VGG perceptual loss,
  backward, Adam update) is **one jitted XLA program**; the only host work
  per step is feeding the next batch and reading back three scalars on the
  logging cadence.
- Data parallelism over a ``jax.sharding.Mesh``: the batch is sharded on the
  ``data`` axis, params/optimizer state are replicated, and XLA inserts the
  gradient all-reduce (psum over ICI). Single-device is the same code with a
  1-device mesh.
- The input pipeline decodes on background threads and prefetches batches to
  device (the reference decodes synchronously in-loop — dataset.py:344-358).
- Logging keeps the reference cadences and tags (scalars every 20 its on
  ``data/fst_train_loss``, eval every 150 on ``data/fst_test_loss``, images
  every 50 on ``data/fst_images`` — network.py:733-761) but reuses the
  step's own loss instead of re-running the closure (the reference computes
  the loss twice every 20th step, network.py:733-741).
"""

from __future__ import annotations

import functools
import os
import sys
import time
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from styletransfer_tpu import ckpt, constants
from styletransfer_tpu.data import coco
from styletransfer_tpu.models import transformer, vgg
from styletransfer_tpu.ops import losses
from styletransfer_tpu.parallel import distributed
from styletransfer_tpu.parallel import mesh as mesh_lib
from styletransfer_tpu.parallel import prefetch
from styletransfer_tpu.utils import images as img_utils
from styletransfer_tpu.utils import tb
from styletransfer_tpu.utils.logging import get_logger

MODEL_NAME = "fast_st"

# torch Adam defaults (the reference uses optim.Adam with no overrides,
# network.py:643-649): lr=1e-3, betas=(0.9, 0.999), eps=1e-8.
ADAM_LR = 1e-3


def make_optimizer(learning_rate: float = ADAM_LR) -> optax.GradientTransformation:
    return optax.adam(learning_rate)


def loss_fn(
    params,
    batch: jnp.ndarray,
    vgg_params,
    style_grams,
    style_weight: float,
    content_weight: float,
    compute_dtype=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Perceptual training objective (network.py:690-731): style + content + TV."""
    batch = img_utils.maybe_normalize_on_device(batch)
    transformed = transformer.apply(params, batch, compute_dtype=compute_dtype)
    perceptual, comps = vgg.perceptual_loss(
        vgg_params, transformed, batch, style_grams,
        style_weight=style_weight, content_weight=content_weight,
        compute_dtype=compute_dtype,
    )
    tv = losses.total_variation_loss(transformed)
    total = perceptual + tv
    metrics = {
        "total": total,
        "style": comps["style"],
        "content": comps["content"],
        "tv": tv,
    }
    return total, metrics


def make_train_step(
    vgg_params,
    style_grams,
    style_weight: float = 100_000.0,
    content_weight: float = 1.0,
    optimizer: Optional[optax.GradientTransformation] = None,
    compute_dtype=None,
    remat: bool = False,
):
    """Build the jitted (params, opt_state, batch) -> (params, opt_state,
    metrics) step. Gradient reduction across the mesh is XLA-inserted from
    the shardings (batch sharded, params replicated).

    ``remat=True`` checkpoints the loss computation (``jax.checkpoint``):
    the backward pass recomputes forward activations instead of storing
    them, trading ~1/3 more FLOPs for a large HBM saving — needed for very
    large batch x resolution products (e.g. batch 256 at 256px exceeds HBM
    without it).
    """
    opt = optimizer or make_optimizer()

    objective = loss_fn
    if remat:
        objective = jax.checkpoint(loss_fn, static_argnums=(4, 5, 6))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(objective, has_aux=True)(
            params, batch, vgg_params, style_grams,
            style_weight, content_weight, compute_dtype,
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return opt, train_step


def make_eval_step(
    vgg_params, style_grams, style_weight: float = 100_000.0,
    feature_weight: float = 1.0, compute_dtype=None,
):
    """Jitted eval: style + feature loss on the clamped output.

    Parity with ``static_test`` (network.py:772-796), including its quirk of
    clamping the ImageNet-normalized output to [0, 255] (which only removes
    negatives) before computing the losses.
    """

    @jax.jit
    def eval_step(params, batch):
        batch = img_utils.maybe_normalize_on_device(batch)
        transformed = transformer.apply(params, batch, compute_dtype=compute_dtype)
        clamped = jnp.clip(transformed, 0.0, 255.0)
        s_loss = jnp.float32(0.0)
        feats = vgg.extract_features(
            vgg_params, clamped, tuple(style_grams), compute_dtype
        )
        for name, tgt in style_grams.items():
            s_loss = s_loss + losses.style_loss(feats[name], tgt)
        f_loss = vgg.feature_loss(vgg_params, clamped, batch, compute_dtype=compute_dtype)
        return style_weight * s_loss + feature_weight * f_loss

    return eval_step


def static_test(params, test_loader, eval_step, mesh) -> float:
    """Mean eval loss over the test loader (network.py:772-796).

    The eval step is a collective on multi-host meshes, so iteration is
    host-locksteppped like the train loop (distributed.lockstep).
    """
    total = []
    for batch in distributed.lockstep(test_loader):
        batch = mesh_lib.shard_batch(batch, mesh)
        total.append(float(eval_step(params, batch)))
    avg = float(np.mean(total)) if total else float("nan")
    get_logger().info("Average test loss: %.8f", avg)
    return avg


def static_train(
    style_image: jnp.ndarray,
    style_name: str = "nsp",
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
    """Train the fast transform net (network.py:651-770).

    ``precision="bf16"`` runs activations (transform net + VGG tower) in
    bfloat16; params, gradients, optimizer state and loss reductions stay
    float32 (standard mixed precision — bf16's exponent range needs no loss
    scaling).

    Keeps the reference's epoch-checkpoint/resume contract: if the epoch's
    checkpoint file exists the epoch is skipped and its weights loaded
    (network.py:681-685). With ``step_checkpoint_every`` set, a mid-epoch
    step state (params + optimizer + epoch/batch position) is additionally
    saved atomically every N steps; on restart training resumes from the
    exact stored batch position — the loader's per-epoch deterministic
    shuffle is fast-forwarded, so no already-trained batch is replayed
    (step-level crash recovery — SURVEY.md §5). Returns the trained params.
    """
    logger = get_logger()
    mesh = mesh or mesh_lib.auto_mesh(batch_size)
    scalar_every, image_every, eval_every = log_cadence

    writer = tb.get_tensorboard_writer(
        runs_dir
        or os.path.join(
            constants.RUNS_PATH, f"fast-image-style-transfer-still-image_{style_name}"
        )
    )

    if vgg_params is None:
        vgg_params = vgg.load_params()
    style_grams = vgg.style_gram_targets(vgg_params, style_image)
    vgg_params = mesh_lib.replicate(vgg_params, mesh)
    style_grams = mesh_lib.replicate(style_grams, mesh)

    if params is None:
        params = transformer.init_params(jax.random.PRNGKey(seed))
    params = mesh_lib.replicate(params, mesh)

    compute_dtype = jnp.bfloat16 if precision == "bf16" else None
    opt, train_step = make_train_step(
        vgg_params, style_grams, style_weight, content_weight,
        compute_dtype=compute_dtype,
    )
    eval_step = make_eval_step(
        vgg_params, style_grams, style_weight, compute_dtype=compute_dtype
    )
    opt_state = mesh_lib.replicate(opt.init(params), mesh)

    if train_loader is None or test_loader is None:
        # Multi-host: each process decodes a disjoint corpus shard and loads
        # its slice of the global batch (parallel/distributed.py).
        proc_idx, proc_cnt = distributed.process_info()
        test_loader, train_loader = coco.get_coco_loader(
            batch_size=distributed.local_batch_size(batch_size),
            test_split=0.10, test_limit=20, seed=seed,
            shard_index=proc_idx, shard_count=proc_cnt,
        )

    logger.info(
        "Training fast_st with Adam on a %d-device mesh (%d process(es))",
        mesh.size, jax.process_count(),
    )

    iteration = 0
    start_epoch = 0
    resume_batches = 0
    if step_checkpoint_every:
        state = ckpt.load_step_state(
            jax.device_get(params), jax.device_get(opt_state),
            MODEL_NAME, style_name, models_path,
            extra_keys=("batch_in_epoch",),
        )
        # Collective resume check: if the step-state files disagree across
        # processes (missing/stale on some hosts), per-process resume would
        # put them at different loop positions and desync the mesh — fall
        # back to epoch-level resume EVERYWHERE together.
        state = distributed.agree_resume_state(state)
        if state is not None:
            params = mesh_lib.replicate(state["params"], mesh)
            opt_state = mesh_lib.replicate(state["opt_state"], mesh)
            start_epoch = int(state["epoch"])
            iteration = int(state["iteration"])
            resume_batches = int(state["extra"].get("batch_in_epoch", 0))
            # Fast-forward the loader to where the crashed run stopped —
            # resumed training must not replay already-trained batches.
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

        logger.info("Starting epoch %d", epoch)
        t0 = time.time()
        n_in_epoch = 0
        epoch_offset = resume_batches if epoch == start_epoch else 0
        resume_batches = 0
        # lockstep: hosts' shard sizes differ by up to one item, so batch
        # counts can differ by one — all hosts must stop together or the
        # longer host hangs in its next collective (parallel/distributed).
        for batch in distributed.lockstep(
            prefetch.prefetch_to_device(train_loader, mesh)
        ):
            params, opt_state, metrics = train_step(params, opt_state, batch)

            if iteration % scalar_every == 0:
                total = float(metrics["total"])
                writer.add_scalar("data/fst_train_loss", total, iteration)
                logger.info("Batch Loss: %.8f", total)
            if iteration % eval_every == 0:
                avg = static_test(params, test_loader, eval_step, mesh)
                writer.add_scalar("data/fst_test_loss", avg, iteration)
            if iteration % image_every == 0 and jax.process_count() == 1:
                # (Multi-host runs skip image previews: slicing the global
                # batch would touch non-addressable shards. Scalars/eval use
                # replicated values and work everywhere.)
                # Packed-path batches are uint8; normalize before the net
                # and for the side-by-side ground truth.
                preview_in = img_utils.maybe_normalize_on_device(batch[:1])
                # Same precision as training — avoids compiling a separate
                # f32 preview program under --precision bf16.
                preview = transformer.apply(params, preview_in, compute_dtype=compute_dtype)
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


def make_serve_fn(precision: str = "f32", pad_mode: str = "reflect"):
    """The uint8-in / uint8-out serving forward shared by every fast_st
    serving path (process_image, process_dir, serve_loop): normalize and
    denormalize/round run in-graph, so host<->device transfers ride uint8
    (4x less traffic than f32; bit-identical to host normalization —
    utils.images tests)."""

    def serve_fn(params, batch_u8):
        x = img_utils.maybe_normalize_on_device(batch_u8)
        y = transformer.apply(
            params, x,
            compute_dtype=jnp.bfloat16 if precision == "bf16" else None,
            pad_mode=pad_mode,
        )
        return img_utils.to_uint8_on_device(y)

    return serve_fn


def process_image(
    image_path: str,
    style_name: str = "nsp",
    out_dir: str = "results/",
    params=None,
    models_path: Optional[str] = None,
    size: Optional[int] = None,
    precision: str = "f32",
    pad_mode: str = "reflect",
) -> str:
    """Stylize one image with the latest trained weights (network.py:798-832).

    ``size`` overrides the working resolution (the net is fully
    convolutional; the reference always resizes to 256, we allow e.g. 512).
    ``pad_mode="zeros"`` reproduces checkpoints trained by the original
    reference code bit-faithfully (its pinned torch 1.1.0 silently used
    zero padding — see models/transformer.py).
    Returns the output path (``converted_fast_st_{style}.png``).

    Transfers ride uint8 in both directions with the normalize /
    denormalize epilogues in-graph (bit-identical to the host-side f32
    pipeline — see utils.images.load_image_uint8).
    """
    if params is None:
        template = transformer.init_params(jax.random.PRNGKey(0))
        params, _ = ckpt.load_latest_transformer(
            MODEL_NAME, style_name, template, models_path
        )

    input_u8 = img_utils.load_image_uint8(
        os.path.join(constants.PROJECT_ROOT_PATH, image_path),
        size=size or constants.IMSIZE,
    )

    serve_fn = make_serve_fn(precision, pad_mode)

    # AOT executable cache: repeat invocations at the serving shapes skip
    # the backend compile entirely (utils/aot.py).
    from styletransfer_tpu.utils import aot

    batch_dev = jnp.asarray(input_u8)
    serve = aot.cached_compile(serve_fn, (params, batch_dev), "fast_serve")
    out_u8 = np.asarray(serve(params, batch_dev))[0]


    out_dir = os.path.join(constants.PROJECT_ROOT_PATH, out_dir)
    os.makedirs(out_dir, exist_ok=True)
    out_file = os.path.join(out_dir, f"converted_fast_st_{style_name}.png")
    img_utils.save_uint8(out_u8, out_file)
    get_logger().info("Saved stylized image to %s", out_file)
    return out_file


IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def process_dir(
    input_dir: str,
    style_name: str,
    out_dir: str = "results/",
    batch_size: int = 64,
    params=None,
    models_path: Optional[str] = None,
    size: Optional[int] = None,
    precision: str = "f32",
    pad_mode: str = "reflect",
) -> list:
    """Stylize every image in a directory with batched inference.

    The serving-shaped sibling of :func:`process_image` (the reference only
    converts one image per process, network.py:798-832): one checkpoint
    load, ONE compiled program (the ragged tail batch is padded up to
    ``batch_size`` and sliced after), threaded host decode overlapped
    across batches, throughput logged. Unreadable files are skipped with a
    warning. Both transfers ride uint8 (normalize/denormalize run
    in-graph — 4x less host<->device traffic than shipping f32); the
    uint8 input path is bit-identical to host normalization. Returns the
    list of written output paths.
    """
    from concurrent.futures import ThreadPoolExecutor


    logger = get_logger()
    in_dir = os.path.join(constants.PROJECT_ROOT_PATH, input_dir)
    files = sorted(
        f for f in os.listdir(in_dir) if f.lower().endswith(IMAGE_EXTS)
    )
    if not files:
        raise FileNotFoundError(f"No images ({'/'.join(IMAGE_EXTS)}) in {in_dir}")

    if params is None:
        template = transformer.init_params(jax.random.PRNGKey(0))
        params, _ = ckpt.load_latest_transformer(
            MODEL_NAME, style_name, template, models_path
        )

    serve_fn = make_serve_fn(precision, pad_mode)
    serve_fn_compiled = None  # AOT-compiled lazily at the first batch shape

    sz = size or constants.IMSIZE
    out_dir = os.path.join(constants.PROJECT_ROOT_PATH, out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def decode(name):
        try:
            return name, img_utils.load_image_uint8(
                os.path.join(in_dir, name), size=sz
            )[0]
        except Exception as exc:  # noqa: BLE001 - skip-and-continue contract
            logger.warning("Skipping unreadable image %s (%s)", name, exc)
            return name, None

    # Single-batch directories compile at their natural size; larger runs
    # compile once at batch_size and pad the ragged tail.
    batch_size = min(batch_size, len(files))

    # Multi-chip serving: the batch is pure data parallelism
    # (parallel/mesh.py:serving_placement; one device = plain placement).
    params, place, _, _ = mesh_lib.serving_placement(batch_size, params)
    out_paths = []
    t0 = time.time()
    n_done = 0
    # Bounded decode window: at most PREFETCH_BATCHES batches are in flight
    # or buffered at once, so huge directories never pile the whole input
    # set into host RAM ahead of device consumption (pool.map would).
    PREFETCH_BATCHES = 4
    from collections import deque

    with ThreadPoolExecutor(max_workers=8) as pool:
        batches = [files[i : i + batch_size] for i in range(0, len(files), batch_size)]

        def decode_batch(chunk):
            return [decode(n) for n in chunk]

        pending = deque()
        next_idx = 0
        while next_idx < len(batches) and len(pending) < PREFETCH_BATCHES:
            pending.append(pool.submit(decode_batch, batches[next_idx]))
            next_idx += 1

        def decoded_iter():
            nonlocal next_idx
            while pending:
                fut = pending.popleft()
                if next_idx < len(batches):
                    pending.append(pool.submit(decode_batch, batches[next_idx]))
                    next_idx += 1
                yield fut.result()

        for chunk in decoded_iter():
            good = [(n, a) for n, a in chunk if a is not None]
            if not good:
                continue
            arr = np.stack([a for _, a in good])
            pad = batch_size - len(good)
            if pad:
                arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
            batch_dev = place(arr)
            if serve_fn_compiled is None:
                from styletransfer_tpu.utils import aot

                serve_fn_compiled = aot.cached_compile(
                    serve_fn, (params, batch_dev), "fast_serve"
                )
            out = np.asarray(serve_fn_compiled(params, batch_dev))[: len(good)]
            for (name, _), img in zip(good, out):
                stem = os.path.splitext(name)[0]
                path = os.path.join(
                    out_dir, f"converted_fast_st_{style_name}_{stem}.png"
                )
                img_utils.save_uint8(img, path)
                out_paths.append(path)
            n_done += len(good)
    dt = time.time() - t0
    logger.info(
        "Stylized %d images in %.1fs (%.1f img/s incl. IO + compile) -> %s",
        n_done, dt, n_done / dt if dt else 0.0, out_dir,
    )
    return out_paths


def serve_loop(
    style_name: str,
    out_dir: str = "results/",
    params=None,
    models_path: Optional[str] = None,
    size: Optional[int] = None,
    precision: str = "f32",
    pad_mode: str = "reflect",
    batch_size: int = 1,
    sizes: Optional[Sequence[int]] = None,
    stdin=None,
    stdout=None,
) -> int:
    """Warm-process serving: a line-oriented stylization daemon.

    The first compile of a serving program costs minutes through a tunneled
    backend and an AOT executable export was a measured rejection there
    (utils/aot.py) — so the production cold-start answer is to keep ONE
    process warm and feed it requests. Protocol (one request per line on
    ``stdin``; responses on ``stdout``, flushed per line, logs on stderr):

    - ``<input_path>`` — stylize, write to
      ``{out_dir}/converted_fast_st_{style}_{stem}.png``.
    - ``<input_path>\\t<output_path>`` — stylize to an explicit output.
    - ``RELOAD`` — re-read the latest checkpoint for (model, style) and
      swap it in WITHOUT recompiling (params are data to the compiled
      program): zero-downtime model updates while training produces new
      epochs. Replies ``OK RELOAD epoch=<n>``; on failure ``ERR RELOAD:
      <reason>`` and the daemon keeps serving the old params. In batched
      mode a RELOAD line splits its group: requests before it serve with
      the old params, after it with the new.
    - blank line or EOF — shut down.

    Responses: ``READY`` once the program is compiled (requests sent before
    then are simply queued in the pipe), then per request ``OK <out_path>``
    or ``ERR <input_path>: <reason>``, in request order. Every image is
    resized to ``size`` (the reference's 256 default) so all requests share
    one compiled shape. Returns the number of successfully served requests.

    ``batch_size > 1`` enables DYNAMIC BATCHING: the daemon drains whatever
    requests have already arrived on stdin (up to ``batch_size``) and runs
    them as one device call — a lone request keeps single-request latency,
    a piped burst gets batched throughput (engines/daemon.py). The ragged
    group is padded to the one compiled shape and sliced after.

    ``sizes`` (CLI ``--sizes 256,512``) serves SEVERAL resolution buckets
    from one daemon: each bucket's program is compiled before ``READY``
    (the net is fully convolutional — same params, jit re-specializes per
    shape), and a request's optional third field picks its bucket
    (``in.jpg\\t\\t512``; absent = the first listed size). In batched mode
    a drained group splits into one device call per bucket present, with
    responses still in request order. Requesting a size that was not
    compiled answers ``ERR`` — serving never compiles mid-request.

    The reference has no serving story beyond one image per process
    (network.py:798-832); this is the daemon form of that CLI contract.
    """

    from styletransfer_tpu.engines import daemon

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")

    logger = get_logger()
    stdout = stdout if stdout is not None else sys.stdout

    if params is None:
        template = transformer.init_params(jax.random.PRNGKey(0))
        params, _ = ckpt.load_latest_transformer(
            MODEL_NAME, style_name, template, models_path
        )

    serve_fn = make_serve_fn(precision, pad_mode)

    # Resolution buckets: one compiled program per size, first = default.
    buckets = daemon.normalize_buckets(sizes, size or constants.IMSIZE)
    default_sz = buckets[0]
    out_dir = os.path.join(constants.PROJECT_ROOT_PATH, out_dir)
    os.makedirs(out_dir, exist_ok=True)

    # Multi-chip serving: a request group is pure data parallelism
    # (parallel/mesh.py:serving_placement; one device = plain placement).
    # The placement is shape-agnostic, so all buckets share it.
    params, place, _, place_params = mesh_lib.serving_placement(
        batch_size, params
    )

    # Compile eagerly at every serving shape so READY means ready:
    # every subsequent request is pure execute (+ the persistent XLA cache
    # makes even this warm-up cheap after the first-ever process).
    serve = jax.jit(serve_fn)
    for s in buckets:
        warm = place(np.zeros((batch_size, s, s, 3), np.uint8))
        t0 = time.time()
        np.asarray(serve(params, warm))
        logger.info("serve: compiled %dpx %s b%d program in %.1fs",
                    s, precision, batch_size, time.time() - t0)
    logger.info("serve: ready (buckets: %s)", buckets)
    print("READY", file=stdout, flush=True)

    def resolve_bucket(fields) -> int:
        """Field-count contract + the optional SIZE field's bucket."""
        if len(fields) > 3:
            raise ValueError(
                f"expected INPUT[\\tOUTPUT[\\tSIZE]], got {len(fields)} fields"
            )
        if len(fields) == 3 and fields[2]:
            try:
                s = int(fields[2])
            except ValueError:
                raise ValueError(f"SIZE must be an integer, got {fields[2]!r}")
            if s not in buckets:
                raise ValueError(f"size {s} not in serving buckets {buckets}")
            return s
        return default_sz

    # The served params live in a cell so RELOAD can swap them: identical
    # pytree structure/shapes means the jitted program is reused as-is.
    state = {"params": params}

    def reload():
        new, epoch = ckpt.load_latest_transformer(
            MODEL_NAME, style_name,
            transformer.init_params(jax.random.PRNGKey(0)), models_path,
        )
        state["params"] = place_params(new)
        return f"RELOAD epoch={epoch}"

    def save_one(in_path, explicit_out, img):
        stem = os.path.splitext(os.path.basename(in_path))[0]
        out_file = daemon.resolve_out_path(
            explicit_out, out_dir, f"converted_fast_st_{style_name}_{stem}.png"
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
            input_u8 = img_utils.load_image_uint8(
                os.path.join(constants.PROJECT_ROOT_PATH, in_path), size=bucket
            )
            out_u8 = np.asarray(serve(state["params"], jnp.asarray(input_u8)))[0]
            return save_one(in_path, explicit_out, out_u8)

        return daemon.run_request_loop(
            handle, stdin=stdin, stdout=stdout, name="serve",
            commands={"RELOAD": reload},
        )

    def decode(i, fields):
        """Host-side parse + uint8 image load for one request (pooled)."""
        try:
            bucket = resolve_bucket(fields)
            in_path = fields[0]
            arr = img_utils.load_image_uint8(
                os.path.join(constants.PROJECT_ROOT_PATH, in_path),
                size=bucket,
            )[0]
            return (i, bucket,
                    (i, in_path, fields[1] if len(fields) > 1 else "", arr),
                    None)
        except Exception as exc:  # noqa: BLE001 - answered per-request
            return i, None, None, exc

    def launch(bucket, metas):
        """Stack/pad the bucket group and START the async device call.

        The submit/finalize split (daemon.make_pooled_segment_submit)
        lets the batched loop overlap this group's fetch+encode with the
        NEXT group's decode+dispatch: on the tunneled TPU the device
        round-trip dominates a wave, and JAX's async dispatch queues
        group k+1 behind group k on-device while the host works both
        ends."""
        arr = np.stack([m[3] for m in metas])
        pad = batch_size - len(metas)
        if pad:
            arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
        return serve(state["params"], place(arr))

    def save(meta, img):
        _, in_path, explicit_out, _ = meta
        return save_one(in_path, explicit_out, img)

    submit_segment = daemon.make_pooled_segment_submit(decode, launch, save)

    return daemon.run_batched_request_loop(
        None, batch_size, stdin=stdin, stdout=stdout, name="serve",
        submit_batch=daemon.segmented_submit_batch(
            submit_segment, {"RELOAD": reload}
        ),
    )
