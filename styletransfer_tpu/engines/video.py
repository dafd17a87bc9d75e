"""Video style transfer: temporally-consistent training and inference.

TPU-native rebuild of ``VideoTransformNet.video_train`` / ``process_video``
(network.py:905-1158). The model is the 6-channel transform net fed
[current frame ⊕ previous stylized frame] (network.py:850-855, 984-986).

Design: the reference processes frames strictly serially in eager mode with
an optimizer step per frame and per-step gradient truncation
(network.py:1022-1024). That recurrence is exactly a ``jax.lax.scan`` with
the previous (content, stylized) pair as carry and ``stop_gradient`` on the
carry — so here a whole **chunk of frames trains inside one jitted scan**
(params and optimizer state ride the carry; one Adam update per frame, same
semantics), with zero host round-trips inside the chunk. Inference uses the
same scan without the update.

The warm-start freeze schedule (freeze everything except the first conv for
epoch 0 when starting from fast_st weights, unfreeze at epoch 1 —
network.py:940-955) is a gradient mask passed into the step, so one compiled
program serves both phases.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from styletransfer_tpu import ckpt, constants
from styletransfer_tpu.data import video as video_data
from styletransfer_tpu.engines.fast import ADAM_LR, make_optimizer
from styletransfer_tpu.models import transformer, vgg
from styletransfer_tpu.ops import losses
from styletransfer_tpu.parallel import distributed as distributed_lib
from styletransfer_tpu.parallel import mesh as mesh_lib
from styletransfer_tpu.utils import images as img_utils
from styletransfer_tpu.utils import tb
from styletransfer_tpu.utils.logging import get_logger

MODEL_NAME = "video_st"


def frame_loss_fn(
    params,
    frame: jnp.ndarray,
    old_content: jnp.ndarray,
    old_stylized: jnp.ndarray,
    vgg_params,
    style_grams,
    style_weight: float,
    content_weight: float,
    temporal_weight: float,
    compute_dtype=None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]:
    """Per-frame objective (network.py:988-1020): style + content + TV +
    temporal. Returns (total, (transformed, metrics))."""
    frame = img_utils.maybe_normalize_on_device(frame)
    net_input = jnp.concatenate([frame, old_stylized], axis=-1)
    transformed = transformer.apply(params, net_input, compute_dtype=compute_dtype)
    perceptual, comps = vgg.perceptual_loss(
        vgg_params, transformed, frame, style_grams,
        style_weight=style_weight, content_weight=content_weight,
        compute_dtype=compute_dtype,
    )
    tv = losses.total_variation_loss(transformed)
    temporal = losses.temporal_loss(
        old_content, old_stylized, frame, transformed, temporal_weight
    )
    total = perceptual + tv + temporal
    metrics = {
        "total": total, "style": comps["style"], "content": comps["content"],
        "tv": tv, "temporal": temporal,
    }
    return total, (transformed, metrics)


def make_scan_train_step(
    vgg_params,
    style_grams,
    style_weight: float = 100_000.0,
    content_weight: float = 1.0,
    temporal_weight: float = 0.8,
    optimizer: Optional[optax.GradientTransformation] = None,
    compute_dtype=None,
):
    """Build the chunked scan train step.

    Signature of the returned jitted fn:
    ``(params, opt_state, frames[T,B,H,W,3], valid[T], old_content,
    old_stylized, grad_mask) -> (params, opt_state, old_content,
    old_stylized, metrics[T])``

    One Adam update per frame inside the scan; the carry's stylized frame is
    stop-gradient'ed exactly like the reference's detached ``old_images``
    (network.py:1022-1024). ``grad_mask`` is a {0,1} pytree implementing the
    warm-start freeze epoch.

    ``valid`` marks real frames: padded tail frames (``_chunk_frames``
    repeats the last frame to keep one compiled shape) take NO update and
    leave the carry untouched — the reference trains only on real frames
    (network.py:974-1037). ``lax.cond`` skips the grad computation for
    padded steps entirely at runtime.
    """
    opt = optimizer or make_optimizer(ADAM_LR)

    _METRIC_KEYS = ("total", "style", "content", "tv", "temporal")

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def scan_step(params, opt_state, frames, valid, old_content, old_stylized,
                  grad_mask):
        def do_update(operand):
            params, opt_state, old_c, old_s, frame = operand
            grads, (transformed, metrics) = jax.grad(
                frame_loss_fn, has_aux=True
            )(
                params, frame, old_c, old_s, vgg_params, style_grams,
                style_weight, content_weight, temporal_weight, compute_dtype,
            )
            grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, grad_mask)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            carry = (
                params,
                opt_state,
                jax.lax.stop_gradient(frame),
                jax.lax.stop_gradient(transformed),
            )
            return carry, metrics

        def skip_update(operand):
            params, opt_state, old_c, old_s, _frame = operand
            metrics = {k: jnp.float32(0.0) for k in _METRIC_KEYS}
            return (params, opt_state, old_c, old_s), metrics

        def body(carry, xs):
            params, opt_state, old_c, old_s = carry
            frame, is_valid = xs
            # Normalize up front so the carry always holds float frames
            # (uint8 packed-path inputs convert once; float is a no-op).
            frame = img_utils.maybe_normalize_on_device(frame)
            return jax.lax.cond(
                is_valid, do_update, skip_update,
                (params, opt_state, old_c, old_s, frame),
            )

        (params, opt_state, old_c, old_s), metrics = jax.lax.scan(
            body, (params, opt_state, old_content, old_stylized), (frames, valid)
        )
        return params, opt_state, old_c, old_s, metrics

    return opt, scan_step


def freeze_mask(params, freeze_all_but_first: bool):
    """Gradient mask for the warm-start schedule (network.py:940-955).

    When active, only ``conv1`` trains: the reference keeps exactly the
    params whose name starts with ``'0.'`` trainable (network.py:946-951),
    which is the first *conv* only — the first instance norm is module
    index 1 and stays frozen (it is warm-started by the surgery,
    network.py:868-877).
    """
    def mask_for(path_key: str):
        trainable = (not freeze_all_but_first) or path_key == "conv1"
        return 1.0 if trainable else 0.0

    return {
        k: jax.tree_util.tree_map(lambda _: jnp.float32(mask_for(k)), v)
        for k, v in params.items()
    }


def _chunk_frames(
    frame_iter: Iterator[np.ndarray], chunk: int, pad_tail: bool = False
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Group per-frame [B,H,W,3] arrays into ``(frames[T,B,H,W,3], valid[T])``.

    Each distinct T is a separate XLA compile, so with ``pad_tail`` the
    ragged tail is padded by repeating its last frame up to ``chunk`` —
    keeping exactly one compiled shape. ``valid`` is False for the padded
    suffix so consumers can mask updates / skip outputs (the reference
    processes only real frames, network.py:974-1037)."""
    buf = []
    for f in frame_iter:
        buf.append(f)
        if len(buf) == chunk:
            yield np.stack(buf), np.ones(chunk, dtype=bool)
            buf = []
    if buf:
        n_real = len(buf)
        if pad_tail:
            buf.extend([buf[-1]] * (chunk - n_real))
        valid = np.zeros(len(buf), dtype=bool)
        valid[:n_real] = True
        yield np.stack(buf), valid


def _all_processes_agree(flag: bool) -> bool:
    """True iff ``flag`` is true on EVERY process (trivially ``flag`` on a
    single process).

    Used for resume decisions that change collective participation (e.g.
    mid-batch vs batch-start): each process deciding from its own local
    state alone could put processes at different positions in the train
    loop, which deadlocks the mesh. Costs one tiny all-gather at startup.
    """
    if jax.process_count() == 1:
        return flag
    from jax.experimental import multihost_utils

    return bool(
        np.asarray(multihost_utils.process_allgather(np.asarray(flag))).all()
    )


def video_train(
    style_image: jnp.ndarray,
    style_name: str = "nsp",
    epochs: int = 50,
    batch_size: int = 4,
    temporal_weight: float = 0.8,
    style_weight: float = 100_000.0,
    content_weight: float = 1.0,
    use_pretrained_fast_st: bool = False,
    mesh=None,
    vgg_params=None,
    params=None,
    video_loader=None,
    seed: int = 0,
    chunk_size: int = 16,
    max_frames: int = video_data.MAX_FRAMES_DEFAULT,
    runs_dir: Optional[str] = None,
    models_path: Optional[str] = None,
    precision: str = "f32",
    step_checkpoint_every: Optional[int] = None,
):
    """Train the video transform net (network.py:905-1069).

    Keeps: per-epoch checkpoint/resume, the freeze-epoch-0 schedule when
    warm-starting from fast_st weights, loss composition and weights, and the
    TB cadences/tags (scalars every 20 frames, image every 50).
    ``step_checkpoint_every`` additionally saves resumable mid-epoch state
    (at chunk granularity) every >=N frame updates, like ``static_train`` —
    including the exact (video batch, chunk) position and the recurrent
    carry frames, so a crash-resume replays no trained frame and produces
    params identical to an uninterrupted run (skipped frames are decoded to
    keep the readers in lockstep, but take no step). Multi-host runs store
    the carry as one iteration-stamped sidecar per process holding its
    LOCAL batch rows (a process cannot ``device_get`` the globally-sharded
    array); resume is exact when EVERY process restarts with its sidecar
    present and the topology unchanged, and otherwise ALL processes degrade
    together to batch-level resume (re-training the stored batch's earlier
    chunks) — the decision is made collectively (one all-gather) because
    per-process fallback would desync the mesh's collectives.
    """
    logger = get_logger()
    mesh = mesh or mesh_lib.auto_mesh(batch_size)

    writer = tb.get_tensorboard_writer(
        runs_dir or os.path.join(constants.RUNS_PATH, f"video-style-transfer_{style_name}")
    )

    if vgg_params is None:
        vgg_params = vgg.load_params()
    style_grams = vgg.style_gram_targets(vgg_params, style_image)
    vgg_params = mesh_lib.replicate(vgg_params, mesh)
    style_grams = mesh_lib.replicate(style_grams, mesh)

    has_external_weights = False
    if params is None:
        fast_params = None
        if use_pretrained_fast_st:
            try:
                template = transformer.init_params(jax.random.PRNGKey(0))
                fast_params, _ = ckpt.load_latest_transformer(
                    "fast_st", style_name, template, models_path
                )
                has_external_weights = True
                logger.info("Warm-starting video net from fast_st weights")
            except FileNotFoundError:
                logger.warning("Couldn't load pretrained fast_st weights")
        params = transformer.init_video_params(
            jax.random.PRNGKey(seed), fast_params=fast_params
        )
    params = mesh_lib.replicate(params, mesh)

    opt, scan_step = make_scan_train_step(
        vgg_params, style_grams, style_weight, content_weight, temporal_weight,
        compute_dtype=jnp.bfloat16 if precision == "bf16" else None,
    )
    opt_state = mesh_lib.replicate(opt.init(params), mesh)

    if video_loader is None:
        # Multi-host: disjoint video shard per process, local slice of the
        # global video batch (parallel/distributed.py).
        from styletransfer_tpu.parallel import distributed

        proc_idx, proc_cnt = distributed.process_info()
        video_loader = video_data.VideoDataset(
            batch_size=distributed.local_batch_size(batch_size),
            shard_index=proc_idx, shard_count=proc_cnt,
        )

    iteration = 0
    start_epoch = 0
    last_step_save = 0
    resume_batches = 0
    resume_chunks = 0
    resume_carry = None
    if step_checkpoint_every:
        state = ckpt.load_step_state(
            jax.device_get(params), jax.device_get(opt_state),
            MODEL_NAME, style_name, models_path,
            extra_keys=("has_external_weights", "batch_in_epoch", "chunk_in_batch"),
            array_keys=("old_content", "old_stylized"),
        )
        # The resume POSITION must be agreed before anything uses it: a
        # host whose main step-state file is missing/stale would otherwise
        # enter the train loop at a different (epoch, iteration, batch,
        # chunk) than its peers and desync the mesh before the carry
        # sidecar check below ever runs. Mismatch -> everyone falls back
        # to epoch-level resume together.
        state = distributed_lib.agree_resume_state(
            state, extra_keys=("batch_in_epoch", "chunk_in_batch")
        )
        if state is not None:
            params = mesh_lib.replicate(state["params"], mesh)
            opt_state = mesh_lib.replicate(state["opt_state"], mesh)
            start_epoch = int(state["epoch"])
            iteration = int(state["iteration"])
            last_step_save = iteration
            # The freeze schedule must not silently change across a resume
            # (re-deriving it from the fast_st checkpoint's presence is
            # fragile if that file moved between crash and resume).
            has_external_weights = bool(int(state["extra"]["has_external_weights"]))
            # Exact mid-epoch position: the video batch index, the chunk
            # index inside it, and the recurrent carry frames at that point.
            # Skipped chunks are decoded (the readers must advance) but take
            # no TPU step — no already-trained frame is replayed.
            resume_batches = int(state["extra"].get("batch_in_epoch", 0))
            resume_chunks = int(state["extra"].get("chunk_in_batch", 0))
            if resume_chunks and {"old_content", "old_stylized"} <= set(
                state["arrays"]
            ):
                resume_carry = (
                    state["arrays"]["old_content"],
                    state["arrays"]["old_stylized"],
                )
            elif resume_chunks and jax.process_count() > 1:
                # Multi-host: the carry lives in per-process sidecars of
                # LOCAL batch rows (shard_batch reassembles the global
                # array below, same as a data batch).
                shard_arrays = ckpt.load_carry_shards(
                    iteration, MODEL_NAME, style_name, models_path,
                    array_keys=("old_content", "old_stylized"),
                )
                # The mid-batch-vs-batch-start decision MUST be collective:
                # if even one process lacks a valid sidecar (e.g. it died
                # between a peer's sidecar write and its own), a per-process
                # fallback would give processes different resume positions —
                # mismatched collective participation and a distributed
                # hang. All processes agree to resume mid-batch only when
                # every sidecar is present and current.
                have_shard = shard_arrays is not None
                if _all_processes_agree(have_shard):
                    resume_carry = (
                        shard_arrays["old_content"],
                        shard_arrays["old_stylized"],
                    )
                else:
                    logger.warning(
                        "Step state has a mid-batch position but at least "
                        "one process's carry sidecar is absent or stale "
                        "(this process: %s); all processes resume from the "
                        "start of video batch %d.",
                        "present" if have_shard else "missing",
                        resume_batches,
                    )
                    resume_chunks = 0
            elif resume_chunks:
                logger.warning(
                    "Step state has a mid-batch position but no carry "
                    "frames; resuming from the start of video batch %d.",
                    resume_batches,
                )
                resume_chunks = 0
            if start_epoch >= epochs:
                logger.warning(
                    "Step state is at epoch %d >= requested epochs %d — "
                    "nothing to train. Delete %s to retrain from scratch.",
                    start_epoch, epochs,
                    ckpt.step_state_path(MODEL_NAME, style_name, models_path),
                )

    step_extra = {"has_external_weights": int(has_external_weights)}

    for epoch in range(start_epoch, epochs):
        if ckpt.epoch_checkpoint_exists(MODEL_NAME, style_name, epoch, models_path):
            # Load THIS epoch's own file (the reference's per-epoch resume,
            # network.py:959-965) — the overall-latest could be a later epoch.
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

        frozen = epoch == 0 and has_external_weights
        if frozen:
            logger.info("Freezing fast-transfer weights for the first epoch")
        mask = mesh_lib.replicate(freeze_mask(params, frozen), mesh)

        skip_batches = resume_batches if epoch == start_epoch else 0
        skip_chunks = resume_chunks if epoch == start_epoch else 0
        carry_restore = resume_carry if epoch == start_epoch else None
        resume_batches = resume_chunks = 0
        resume_carry = None

        logger.info("Starting epoch %d", epoch)
        # Both loop levels iterate in multi-host LOCKSTEP
        # (distributed_lib.lockstep): per-host video-batch counts differ
        # when the corpus doesn't shard evenly, and per-batch CHUNK counts
        # differ whenever hosts' local batches have different shortest
        # clips (iterate_on_video_batches stops at the local shortest) —
        # either would leave one host blocked in the collective scan_step
        # while a peer moved on. Resume skip counts are collectively
        # agreed (agree_resume_state), so the skip paths stay aligned.
        for batch_idx, readers in enumerate(
            distributed_lib.lockstep(video_loader)
        ):
            if batch_idx < skip_batches:
                # This video batch finished before the crash.
                for r in readers:
                    r.close()
                continue
            frame_iter = video_data.iterate_on_video_batches(readers, max_frames)
            # First frame of each video batch initializes the carry with
            # itself (old = [batch, batch], network.py:972-978); it is also
            # the first frame *trained on*, inside the first chunk, so every
            # chunk shares one compiled shape.
            old_content = None
            chunks_done = 0
            for chunk, valid in distributed_lib.lockstep(
                _chunk_frames(frame_iter, chunk_size, pad_tail=True)
            ):
                if batch_idx == skip_batches and chunks_done < skip_chunks:
                    # Trained before the crash: decode (the readers must
                    # advance in lockstep) but take no update.
                    chunks_done += 1
                    continue
                if old_content is None:
                    if carry_restore is not None and batch_idx == skip_batches:
                        # Mid-batch resume: the recurrent carry at the crash
                        # point was stored with the step state.
                        old_content = mesh_lib.shard_batch(
                            jnp.asarray(carry_restore[0]), mesh
                        )
                        old_stylized = mesh_lib.shard_batch(
                            jnp.asarray(carry_restore[1]), mesh
                        )
                        carry_restore = None
                    else:
                        old_content = mesh_lib.shard_batch(chunk[0], mesh)
                        old_stylized = old_content
                chunk_dev = mesh_lib.shard_frames(chunk, mesh)
                params, opt_state, old_content, old_stylized, metrics = scan_step(
                    params, opt_state, chunk_dev, jnp.asarray(valid),
                    old_content, old_stylized, mask
                )
                # Post-hoc logging at the reference cadences over the chunk;
                # padded tail frames took no update and are not counted in
                # `iteration` (valid padding is always a suffix).
                totals = np.asarray(metrics["total"])[: int(valid.sum())]
                for i, total in enumerate(totals):
                    it = iteration + i
                    if it % 20 == 0:
                        writer.add_scalar("data/fst_train_loss", float(total), it)
                        logger.info("Epoch: %d\tBatch Loss: %.4f", epoch, float(total))
                image_steps = [
                    iteration + i
                    for i in range(len(totals))
                    if (iteration + i) % 50 == 0
                ]
                if image_steps and jax.process_count() > 1:
                    # Multi-host runs skip image previews — see engines/fast.py.
                    image_steps = []
                if image_steps:
                    # Preview image: stylize the carry frame pair. Reference
                    # indexes batch[2] assuming batch>=3 (network.py:1054);
                    # guard with a clamped index.
                    b_idx = min(2, chunk.shape[1] - 1)
                    preview_in = jnp.concatenate(
                        [old_content[b_idx : b_idx + 1], old_stylized[b_idx : b_idx + 1]],
                        axis=-1,
                    )
                    preview = transformer.apply(params, preview_in)
                    pair = img_utils.concat_images(
                        img_utils.to_uint8(np.asarray(preview)),
                        img_utils.to_uint8(np.asarray(old_content[b_idx : b_idx + 1])),
                        axis=1,
                    )
                    writer.add_image("data/fst_images", pair, image_steps[0])
                iteration += len(totals)
                chunks_done += 1
                if (
                    step_checkpoint_every
                    and iteration - last_step_save >= step_checkpoint_every
                ):
                    # Position (video batch, chunk) plus the recurrent carry
                    # make the resume exact: no trained frame is replayed.
                    # Multi-host: a process can only fetch its addressable
                    # shards of the sharded carry, so each process writes a
                    # per-process sidecar of its LOCAL batch rows first
                    # (iteration-stamped — a crash between the two writes
                    # degrades to batch-level resume, never corrupts).
                    arrays = None
                    if jax.process_count() == 1:
                        arrays = {
                            "old_content": old_content,
                            "old_stylized": old_stylized,
                        }
                    else:
                        ckpt.save_carry_shards(
                            {
                                "old_content": old_content,
                                "old_stylized": old_stylized,
                            },
                            iteration, MODEL_NAME, style_name, models_path,
                        )
                    ckpt.save_step_state(
                        params, opt_state, epoch, iteration,
                        MODEL_NAME, style_name, models_path,
                        extra={
                            **step_extra,
                            "batch_in_epoch": batch_idx,
                            "chunk_in_batch": chunks_done,
                        },
                        arrays=arrays,
                    )
                    last_step_save = iteration

        ckpt.save_epoch(params, MODEL_NAME, style_name, epoch, models_path)
        if step_checkpoint_every:
            # Keep the step state ahead of the epoch checkpoint (see
            # static_train) so post-epoch crashes keep optimizer moments.
            ckpt.save_step_state(
                params, opt_state, epoch + 1, iteration,
                MODEL_NAME, style_name, models_path,
                extra={**step_extra, "batch_in_epoch": 0, "chunk_in_batch": 0},
            )
            last_step_save = iteration

    writer.close()
    return params


# ---------------------------------------------------------------------------
# Inference.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("compute_dtype", "pad_mode"))
def _stylize_chunk(params, frames, old_stylized, compute_dtype=None,
                   pad_mode="reflect"):
    """Scan-stylize a [T,B,H,W,3] chunk; carry is the previous stylized frame
    (recurrent feedback, network.py:1117-1131)."""

    def body(old, frame):
        # uint8 frames (the serving input path) normalize in-graph; float
        # frames pass through — the dtype check happens at trace time.
        frame = img_utils.maybe_normalize_on_device(frame)
        net_input = jnp.concatenate([frame, old], axis=-1)
        out = transformer.apply(params, net_input, compute_dtype=compute_dtype,
                                pad_mode=pad_mode)
        return out, out

    _, outs = jax.lax.scan(body, old_stylized, frames)
    return outs


def stylize_clip(params, frames: np.ndarray, precision: str = "f32",
                 pad_mode: str = "reflect") -> np.ndarray:
    """Stylize a whole clip [T,H,W,3] (or [T,B,H,W,3]) in one scanned jit.

    The first frame pairs with itself (network.py:1120-1121).
    """
    squeeze = frames.ndim == 4
    if squeeze:
        frames = frames[:, None]
    frames = jnp.asarray(frames)
    dt = jnp.bfloat16 if precision == "bf16" else None
    # The carry must be MODEL-SPACE like every other seed site
    # (process_video, process_video_dir, serve_stream_loop): uint8 input
    # frames normalize in-graph inside the scan body, but the initial
    # carry bypasses the body — seeding it raw would feed 0-255 values
    # into channels expecting ~[-2.6, 2.6] on the first frame.
    outs = _stylize_chunk(params, frames,
                          img_utils.maybe_normalize_on_device(frames[0]),
                          compute_dtype=dt, pad_mode=pad_mode)
    outs = np.asarray(outs)
    return outs[:, 0] if squeeze else outs


def process_video(
    video_path: str,
    style_name: str = "nsp",
    working_dir: str = "workdir/",
    out_dir: str = "results/",
    fps: float = 24.0,
    params=None,
    models_path: Optional[str] = None,
    chunk_size: int = 24,
    save_frames: bool = False,
    max_frames: int = video_data.MAX_FRAMES_DEFAULT,
    precision: str = "f32",
    pad_mode: str = "reflect",
) -> str:
    """Stylize a single video (network.py:1071-1158).

    Frames stream through the scanned stylizer in chunks and are muxed
    straight into the output mp4 — the reference's intermediate
    PNG-per-frame round-trip (network.py:1133-1156) is skipped unless
    ``save_frames`` is set. Returns the output video path.
    """
    logger = get_logger()
    if params is None:
        template = transformer.init_params(jax.random.PRNGKey(0), in_channels=6)
        params, _ = ckpt.load_latest_transformer(
            MODEL_NAME, style_name, template, models_path
        )

    video_path = os.path.join(constants.PROJECT_ROOT_PATH, video_path)
    out_dir = os.path.join(constants.PROJECT_ROOT_PATH, out_dir)
    os.makedirs(out_dir, exist_ok=True)
    if save_frames:
        working_dir = os.path.join(constants.PROJECT_ROOT_PATH, working_dir)
        import shutil

        shutil.rmtree(working_dir, ignore_errors=True)
        os.makedirs(working_dir, exist_ok=True)

    video_writer, final_path = _open_video_writer(
        os.path.join(out_dir, f"video_st_{style_name}"), fps, logger
    )

    reader = video_data.ImageioFrameReader(video_path, normalized=False)
    real_count = {"n": 0}  # frames actually read (excludes tail padding)

    def frame_stream():
        for _ in range(max_frames):
            f = reader.next_frame()
            if f is None:
                return
            real_count["n"] += 1
            yield f

    logger.info("Starting to process video into stylized frames")
    old_stylized = None
    frame_idx = 0
    for chunk, _valid in _chunk_frames(frame_stream(), chunk_size, pad_tail=True):
        # pad_tail keeps a single compiled shape; padded outputs beyond the
        # real frame count are skipped when writing.
        frames = jnp.asarray(chunk)  # [chunk,1,H,W,3] uint8
        if old_stylized is None:
            # The carry is model-space: normalize the first frame on device.
            old_stylized = img_utils.maybe_normalize_on_device(frames[0])
        outs = _stylize_chunk(
            params, frames, old_stylized,
            compute_dtype=jnp.bfloat16 if precision == "bf16" else None,
            pad_mode=pad_mode,
        )
        old_stylized = outs[-1]
        # One bulk uint8 readback per chunk (denormalize/clamp/round run
        # on-device) instead of a per-frame f32 transfer + host epilogue.
        outs_u8 = np.asarray(img_utils.to_uint8_on_device(outs))
        for t in range(outs_u8.shape[0]):
            if frame_idx >= real_count["n"]:
                break
            video_writer.append_data(outs_u8[t, 0])
            if save_frames:
                img_utils.save_image(
                    np.asarray(outs[t]), os.path.join(working_dir, f"{frame_idx}.png")
                )
            frame_idx += 1
        if frame_idx % 50 < chunk_size:
            logger.info(".. processing, currently frame %d", frame_idx)

    reader.close()
    video_writer.close()
    logger.info("Done! Final stylized video can be found in: %s", final_path)
    return final_path


VIDEO_EXTS = (".gif", ".mp4", ".avi", ".mov", ".webm", ".mkv")


def _open_video_writer(base_path: str, fps: float, logger):
    """mp4 writer, falling back to GIF when no codec backend exists
    (same fallback contract as process_video). Returns (writer, path)."""
    import imageio

    try:
        return imageio.get_writer(base_path + ".mp4", fps=fps), base_path + ".mp4"
    except (ValueError, ImportError):
        path = base_path + ".gif"
        logger.warning(
            "No mp4 encoder backend available; writing GIF instead: %s", path
        )
        return imageio.get_writer(path, duration=1000.0 / fps, loop=0), path


def process_video_dir(
    input_dir: str,
    style_name: str = "nsp",
    out_dir: str = "results/",
    batch_size: int = 4,
    fps: float = 24.0,
    params=None,
    models_path: Optional[str] = None,
    chunk_size: int = 24,
    max_frames: int = video_data.MAX_FRAMES_DEFAULT,
    precision: str = "f32",
    pad_mode: str = "reflect",
) -> list:
    """Stylize every video in a directory, several clips per scanned program.

    The serving-shaped sibling of ``fast.process_dir`` for video: the
    recurrent scan already takes [T, B, ...] (one carry lane per clip —
    lanes never mix, since every op is per-sample), so clips in a group
    advance in lockstep through ONE compiled program. Clips that end early
    keep feeding their last frame (their outputs are discarded); the ragged
    last group is padded with copies of its first lane so every chunk
    shares one compiled shape. Per-clip outputs are bit-identical to
    processing each clip alone. Returns the list of output paths.
    """
    logger = get_logger()
    in_dir = os.path.join(constants.PROJECT_ROOT_PATH, input_dir)
    files = sorted(f for f in os.listdir(in_dir) if f.lower().endswith(VIDEO_EXTS))
    if not files:
        raise FileNotFoundError(
            f"No videos ({'/'.join(VIDEO_EXTS)}) in {in_dir}"
        )
    if params is None:
        template = transformer.init_params(jax.random.PRNGKey(0), in_channels=6)
        params, _ = ckpt.load_latest_transformer(
            MODEL_NAME, style_name, template, models_path
        )
    out_dir = os.path.join(constants.PROJECT_ROOT_PATH, out_dir)
    os.makedirs(out_dir, exist_ok=True)
    cd = jnp.bfloat16 if precision == "bf16" else None

    batch_size = min(batch_size, len(files))

    # Multi-chip serving: clip lanes are independent recurrences, so the
    # clip axis (axis 1 of each [T, B, ...] chunk) shards and the carry
    # rides sharded [B, ...] (parallel/mesh.py:serving_placement; one
    # device = plain placement).
    params, _, place_frames, _ = mesh_lib.serving_placement(
        batch_size, params
    )

    outputs = []
    t0 = time.time()
    total_written = 0
    for gstart in range(0, len(files), batch_size):
        group, readers = [], []
        for f in files[gstart : gstart + batch_size]:
            try:
                readers.append(
                    video_data.ImageioFrameReader(
                        os.path.join(in_dir, f), normalized=False
                    )
                )
                group.append(f)
            except Exception as exc:  # noqa: BLE001 - skip-and-continue contract
                logger.warning("Skipping unreadable video %s (%s)", f, exc)
        if not group:
            continue
        nb = len(group)
        counts = [0] * nb     # real frames read per lane
        done = [False] * nb
        last = [None] * nb

        def rows():
            for _ in range(max_frames):
                any_live = False
                row = []
                for j in range(nb):
                    f = None
                    if not done[j]:
                        f = readers[j].next_frame()
                        if f is None:
                            done[j] = True
                    if f is not None:
                        any_live = True
                        last[j] = f
                        counts[j] += 1
                    row.append(last[j])
                if not any_live:
                    return
                # A clip that yielded no frame at all rides a zero lane.
                template_frame = next(r for r in row if r is not None)
                row = [r if r is not None else np.zeros_like(template_frame)
                       for r in row]
                yield np.concatenate(row, axis=0)  # [nb, H, W, 3]

        writers, paths = [], []
        for f in group:
            stem = os.path.splitext(f)[0]
            w, p = _open_video_writer(
                os.path.join(out_dir, f"video_st_{style_name}_{stem}"), fps, logger
            )
            writers.append(w)
            paths.append(p)

        old_stylized = None
        tstep = 0
        for chunk, _valid in _chunk_frames(rows(), chunk_size, pad_tail=True):
            if nb < batch_size:  # ragged clip group: pad lanes, keep one shape
                chunk = np.concatenate(
                    [chunk] + [chunk[:, :1]] * (batch_size - nb), axis=1
                )
            frames = place_frames(chunk)  # uint8
            if old_stylized is None:
                old_stylized = img_utils.maybe_normalize_on_device(frames[0])
            outs = _stylize_chunk(
                params, frames, old_stylized, compute_dtype=cd, pad_mode=pad_mode
            )
            old_stylized = outs[-1]
            # Bulk uint8 readback (see process_video).
            outs_u8 = np.asarray(img_utils.to_uint8_on_device(outs))
            for t in range(outs_u8.shape[0]):
                for j in range(nb):
                    if tstep + t < counts[j]:
                        writers[j].append_data(outs_u8[t, j])
                        total_written += 1
            tstep += outs_u8.shape[0]

        for r in readers:
            r.close()
        for j, w in enumerate(writers):
            w.close()
            if counts[j] == 0:
                # Unreadable clip: drop its empty output file.
                logger.warning("No frames decoded from %s; skipping", group[j])
                os.remove(paths[j])
            else:
                outputs.append(paths[j])
    dt = time.time() - t0
    logger.info(
        "Stylized %d clips (%d frames) in %.1fs (%.1f fps incl. IO + compile)",
        len(outputs), total_written, dt, total_written / dt if dt else 0.0,
    )
    return outputs


def serve_stream_loop(
    style_name: str,
    out_dir: str = "results/",
    params=None,
    models_path: Optional[str] = None,
    size: Optional[int] = None,
    precision: str = "f32",
    pad_mode: str = "reflect",
    batch_size: int = 1,
    max_streams: int = 64,
    sizes=None,
    stdin=None,
    stdout=None,
) -> int:
    """Warm-process STREAMING stylization: one frame per request, with the
    recurrent carry held across requests.

    The video net's temporal consistency comes from feeding each frame the
    previous *stylized* frame (network.py:1117-1131); batch conversion gets
    that from ``lax.scan``. A live source (camera, screen capture, frames
    arriving over a queue) can't be scanned — so this daemon keeps the
    carry in device memory between requests: consecutive requests form one
    temporally-consistent stream, served frame-by-frame at single-frame
    latency (the 605 fps single-stream rate in docs/performance.md is this
    step's throughput ceiling).

    Protocol (line-oriented, responses flushed; same shape as
    ``fast.serve_loop``):

    - ``<frame_path>`` / ``<frame_path>\\t<output_path>`` — stylize the
      next frame of the current stream; reply ``OK <out_path>``.
    - ``RESET`` — end the stream; the next frame starts a fresh one
      (pairs with itself, like a clip's first frame). Replies ``OK RESET``.
    - ``RELOAD`` — swap in the latest checkpoint without recompiling
      (``OK RELOAD epoch=<n>``; failure answers ERR and keeps the old
      params). Stream carries survive a reload — the recurrence
      conditions on the previous stylized frame as data, whatever params
      produced it. In batched mode RELOAD is a wave barrier like bare
      ``RESET``.
    - blank line or EOF — shut down.

    Returns the number of OK responses — bare ``RESET`` in serial mode
    rides the command path and is not counted; per-stream resets and
    batched-mode resets are acknowledgements and do count. Failed
    requests reply ``ERR <input>: <reason>`` and do NOT advance the
    carry (per request — a failed wave never un-serves earlier waves).

    **Multiple concurrent streams**: an optional third field names the
    stream — ``FRAME[\\tOUTPUT[\\tSTREAM]]`` — and each stream keeps its
    own carry (several cameras / capture sessions through ONE warm
    daemon; omitted = stream ``"0"``, the single-stream contract above).
    ``RESET\\t\\t<stream>`` resets one stream; bare ``RESET`` resets all.
    Per-stream carries are LRU-capped at ``max_streams`` (eviction is
    logged; an evicted stream silently restarts on its next frame). The
    default output name gains an ``s{stream}_`` tag for streams other
    than ``"0"``.

    **Cross-stream dynamic batching** (``batch_size > 1``): pending
    requests for DIFFERENT streams group into one device call — lanes
    never mix (every op is per-sample), so outputs are bit-identical to
    serial single-stream serving. Same-stream requests in one group are
    serialized into successive waves (the carry is a dependency), a lone
    request keeps the single-frame program's latency, and ragged waves
    pad to the compiled shape. The lane axis shards over a 1-D device
    mesh like every batched serving path (docs/serving.md "Scaling out").

    **Resolution buckets** (``sizes``, CLI ``--sizes 256,512``): every
    bucket's programs compile before ``READY``, and an optional FOURTH
    field sizes a stream — ``FRAME[\\tOUTPUT[\\tSTREAM[\\tSIZE]]]``. A
    stream's bucket is fixed by its FIRST frame (absent = first listed
    size) and remembered: later frames may omit SIZE, and naming a
    DIFFERENT size for a live stream answers ``ERR`` (the carry has a
    shape — ``RESET`` the stream to change it). Batched waves split into
    one device call per bucket present; responses stay in request order.
    """
    import re as _re
    import sys as _sys
    from collections import OrderedDict


    logger = get_logger()
    stdout = stdout if stdout is not None else _sys.stdout

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if max_streams < max(batch_size, 1):
        # Fewer carry slots than lanes per wave would evict carries written
        # in the SAME wave — every stream would silently restart each wave
        # while answering OK, destroying temporal consistency.
        raise ValueError(
            f"max_streams must be >= batch_size (and >= 1), got "
            f"{max_streams} with batch_size={batch_size}"
        )
    if params is None:
        template = transformer.init_params(jax.random.PRNGKey(0), in_channels=6)
        params, _ = ckpt.load_latest_transformer(
            MODEL_NAME, style_name, template, models_path
        )

    cd = jnp.bfloat16 if precision == "bf16" else None

    @jax.jit
    def step(params, frame_u8, old):
        f = img_utils.maybe_normalize_on_device(frame_u8)
        out = transformer.apply(
            params, jnp.concatenate([f, old], axis=-1),
            compute_dtype=cd, pad_mode=pad_mode,
        )
        return out, img_utils.to_uint8_on_device(out)

    norm = jax.jit(img_utils.maybe_normalize_on_device)

    from styletransfer_tpu.engines import daemon

    # Resolution buckets: one compiled program set per size, first =
    # default (one shared contract: daemon.normalize_buckets; here a
    # BUCKET belongs to a stream — its carry has the shape).
    buckets = daemon.normalize_buckets(sizes, size or constants.IMSIZE)
    default_sz = buckets[0]
    out_dir = os.path.join(constants.PROJECT_ROOT_PATH, out_dir)
    os.makedirs(out_dir, exist_ok=True)

    # Multi-chip serving: cross-stream waves shard the lane axis
    # (parallel/mesh.py:serving_placement; one device = plain placement).
    params, place, _, place_params = mesh_lib.serving_placement(
        batch_size, params
    )

    # Per-stream carries (previous stylized frame, normalized model
    # space) live in ONE resident device buffer per bucket — a slot
    # table. Waves assemble their ``olds`` with a single gather
    # (``jnp.take``) and write outputs back with a single scatter
    # (``.at[idx].set``) instead of a concatenate over N per-lane arrays
    # plus N slices: 2 dispatches per wave vs ~2N. Measured 22% per-wave
    # at 64 lanes through the tunneled backend
    # (benchmarks/video_wave_bench.py: 1.05 -> 0.82 s/wave). Row 0 of
    # each buffer is a scratch slot — padded and failed lanes scatter
    # there — so every wave op keeps ONE static shape; real slots are
    # 1-based. Index operands are always device arrays (a Python-int
    # index would bake into the program and recompile per slot). The f32
    # carries never ride the host link (only uint8 outputs are read
    # back). Tables start small and DOUBLE toward ``--max-streams`` as
    # streams materialize: sizing eagerly at the cap would pin
    # (cap+1)·s²·12 bytes of device memory per bucket (~250 MB at the
    # defaults with --sizes 256,512) whether or not any stream exists.
    # Appending rows keeps every live slot index valid and the scratch
    # row at 0; each growth step's gather/scatter programs recompile once
    # at the new table shape (small ops, logged, ≤ log2(cap) times per
    # bucket over the daemon's life).
    class _SlotCarries:
        def __init__(self, cap, init):
            self.cap = cap
            self.init = max(1, min(init, cap))
            self.lru = OrderedDict()  # sid -> (bucket, slot)
            self.buffers = {}         # bucket -> [rows+1, s, s, 3] f32
            self.rows = {}            # bucket -> allocated slots (excl. 0)
            self.free = {}            # bucket -> free slot indices

        def __contains__(self, sid):
            return sid in self.lru

        def __len__(self):
            return len(self.lru)

        def bucket_of(self, sid):
            return self.lru[sid][0]

        def slot_of(self, sid):
            return self.lru[sid][1]

        def scratch(self, bucket):
            self._ensure(bucket)
            return 0

        def _ensure(self, bucket):
            if bucket not in self.buffers:
                self.rows[bucket] = self.init
                self.buffers[bucket] = jnp.zeros(
                    (self.init + 1, bucket, bucket, 3), jnp.float32)
                self.free[bucket] = list(range(1, self.init + 1))

        def _grow(self, bucket):
            old = self.rows[bucket]
            new = min(self.cap, old * 2)
            logger.info(
                "video serve: growing %dpx slot table %d -> %d rows "
                "(first wave at the new shape pays a small recompile)",
                bucket, old, new,
            )
            self.buffers[bucket] = jnp.concatenate([
                self.buffers[bucket],
                jnp.zeros((new - old, bucket, bucket, 3), jnp.float32),
            ])
            self.free[bucket].extend(range(old + 1, new + 1))
            self.rows[bucket] = new

        def get_old(self, sid):
            """The stream's carry as a [1, s, s, 3] device array (one
            gather), or None for a fresh stream."""
            if sid not in self.lru:
                return None
            bucket, slot = self.lru[sid]
            return jnp.take(self.buffers[bucket], jnp.asarray([slot]),
                            axis=0)

        def allocate(self, sid, bucket, protected=()):
            """A slot for a NEW stream (evicting the LRU stream at
            capacity, like the per-lane store did). ``protected`` sids —
            the current wave's other lanes, whose slot numbers the caller
            already holds — are skipped (rotated to MRU), or eviction
            could free a slot mid-wave and hand it to a second lane. A
            victim outside the wave always exists: a wave has at most
            batch_size <= max_streams lanes, one stream each. The caller
            commits the sid only after its request succeeds — ``release``
            returns the slot if the request fails. A failed fresh request
            at capacity may therefore still evict (allocation precedes
            the outcome); below capacity — the common case — it never
            does."""
            self._ensure(bucket)
            while not self.free[bucket] or len(self.lru) >= self.cap:
                if (not self.free[bucket] and self.rows[bucket] < self.cap
                        and len(self.lru) < self.cap):
                    self._grow(bucket)
                    continue
                evicted, (eb, eslot) = self.lru.popitem(last=False)
                if evicted in protected:
                    self.lru[evicted] = (eb, eslot)  # re-insert at MRU
                    continue
                self.free[eb].append(eslot)
                logger.warning(
                    "video serve: evicted stream %r (max-streams=%d); its "
                    "next frame starts a fresh stream", evicted, self.cap,
                )
            return self.free[bucket].pop()

        def release(self, bucket, slot):
            self.free[bucket].append(slot)

        def commit(self, sid, bucket, slot):
            """Register/refresh sid at slot (the buffer row was already
            scattered) and mark it most-recently-used."""
            self.lru[sid] = (bucket, slot)
            self.lru.move_to_end(sid)

        def scatter(self, bucket, idx, rows):
            """Write ``rows`` ([B, s, s, 3]) at ``idx`` ([B] int array;
            scratch entries absorb padded/failed lanes)."""
            self.buffers[bucket] = self.buffers[bucket].at[idx].set(rows)

        def pop(self, sid):
            entry = self.lru.pop(sid, None)
            if entry is not None:
                self.free[entry[0]].append(entry[1])

        def clear(self):
            for bucket in self.buffers:
                self.free[bucket] = list(range(1, self.rows[bucket] + 1))
            self.lru.clear()

    # Initial table: enough for one full wave of fresh streams (so the
    # common batched case never grows mid-wave) and at least 8.
    carries = _SlotCarries(max_streams, init=max(8, batch_size))

    # Eager compile at the fixed shapes: READY means ready. The [1, ...]
    # single-frame program always compiles (lone requests use it); the
    # batched wave program compiles only when batching is on. The slot
    # buffers allocate (at their initial size) and their gather/scatter/
    # norm programs warm here too (everything scatters to the scratch
    # row); a later table growth recompiles only those small table ops.
    t0 = time.time()
    for s in buckets:
        warm = jnp.zeros((1, s, s, 3), jnp.uint8)
        np.asarray(step(params, warm, norm(warm))[1])
        scr = carries.scratch(s)
        idx1 = jnp.asarray([scr])
        carries.scatter(s, idx1, jnp.zeros((1, s, s, 3), jnp.float32))
        float(jnp.sum(jnp.take(carries.buffers[s], idx1, axis=0)))
        if batch_size > 1:
            warm_b = place(np.zeros((batch_size, s, s, 3), np.uint8))
            old_b = place(np.zeros((batch_size, s, s, 3), np.float32))
            np.asarray(step(params, warm_b, old_b)[1])
            idx_b = jnp.asarray(np.full(batch_size, scr, np.int32))
            carries.scatter(s, idx_b, norm(warm_b))
            float(jnp.sum(place(jnp.take(
                carries.buffers[s], idx_b, axis=0))))
    logger.info(
        "video serve: compiled %s px %s stream step (batch=%d) in %.1fs; ready",
        buckets, precision, batch_size, time.time() - t0,
    )
    print("READY", file=stdout, flush=True)


    def stream_bucket(sid, size_field) -> int:
        """A stream's resolution: fixed by its first frame, remembered
        after (the carry has a shape — changing mid-stream is an ERR)."""
        want = None
        if size_field:
            try:
                want = int(size_field)
            except ValueError:
                raise ValueError(
                    f"SIZE must be an integer, got {size_field!r}"
                )
            if want not in buckets:
                raise ValueError(
                    f"size {want} not in serving buckets {buckets}"
                )
        if sid in carries:
            have = carries.bucket_of(sid)
            if want is not None and want != have:
                raise ValueError(
                    f"stream {sid!r} is {have}px; RESET it before changing "
                    f"size to {want}"
                )
            return have
        return want if want is not None else default_sz

    def reset_all():
        carries.clear()
        return "RESET"

    # Served params live in a cell so RELOAD can swap in a newer checkpoint
    # without recompiling (same pytree structure -> same jitted program).
    # Stream carries survive a reload: the recurrence conditions on the
    # previous stylized frame as data, whatever params produced it.
    state = {"params": params}

    def reload():
        new, epoch = ckpt.load_latest_transformer(
            MODEL_NAME, style_name,
            transformer.init_params(jax.random.PRNGKey(0), in_channels=6),
            models_path,
        )
        state["params"] = place_params(new)
        return f"RELOAD epoch={epoch}"

    def default_name(in_path, sid):
        stem = os.path.splitext(os.path.basename(in_path))[0]
        tag = "" if sid == "0" else f"s{_re.sub(r'[^\w.-]', '_', sid)}_"
        return f"video_st_{style_name}_{tag}{stem}.png"

    def load_frame(in_path, bucket):
        return img_utils.load_image_uint8(
            os.path.join(constants.PROJECT_ROOT_PATH, in_path), size=bucket
        )

    def run_single(in_path, explicit_out, sid, bucket, frame_dev, old_dev,
                   protected=()):
        out_model, out_u8 = step(state["params"], frame_dev, old_dev)
        out_arr = np.asarray(out_u8)[0]  # forces completion of out_model too
        out_file = daemon.resolve_out_path(
            explicit_out, out_dir, default_name(in_path, sid)
        )
        # ``protected``: when this lone lane is part of a batched WAVE
        # (one bucket had a single request), an eviction here must not
        # pick a stream that has a pending lane in another bucket of the
        # SAME wave — its carry would silently reset before its lane ran.
        slot = (carries.slot_of(sid) if sid in carries
                else carries.allocate(sid, bucket, protected=protected))
        try:
            img_utils.save_uint8(out_arr, out_file)
        except BaseException:
            # Advance the carry only once the request has fully succeeded —
            # a save failure answers ERR and must leave the stream state
            # intact (the documented "failed requests do NOT advance the
            # carry"). A fresh stream's tentative slot goes back.
            if sid not in carries:
                carries.release(bucket, slot)
            raise
        carries.scatter(bucket, jnp.asarray([slot]), out_model)
        carries.commit(sid, bucket, slot)
        return out_file

    def parse(fields):
        if len(fields) > 4:
            raise ValueError(
                "expected FRAME[\\tOUTPUT[\\tSTREAM[\\tSIZE]]], got "
                f"{len(fields)} fields"
            )
        return (fields[0], fields[1] if len(fields) > 1 else "",
                (fields[2] if len(fields) > 2 else "") or "0",
                fields[3] if len(fields) > 3 else "")

    def handle(*fields):
        in_path, explicit_out, sid, size_field = parse(fields)
        if in_path == "RESET":
            if len(fields) == 2 or (len(fields) > 3 and fields[3]):
                # Reject rather than guess: batched and serial modes must
                # not diverge on a malformed trailing-tab RESET.
                raise ValueError(
                    "RESET takes no OUTPUT/SIZE field; use RESET or "
                    "RESET\\t\\t<stream>"
                )
            carries.pop(sid)
            return f"RESET {sid}" if len(fields) > 2 else "RESET"
        bucket = stream_bucket(sid, size_field)
        frame_dev = jnp.asarray(load_frame(in_path, bucket))
        old_dev = carries.get_old(sid)
        if old_dev is None:
            old_dev = norm(frame_dev)
        return run_single(in_path, explicit_out, sid, bucket, frame_dev,
                          old_dev)

    if batch_size == 1:
        return daemon.run_request_loop(
            handle, stdin=stdin, stdout=stdout, name="video serve",
            commands={"RESET": reset_all, "RELOAD": reload},
        )

    def handle_batch(requests):
        results: list = [None] * len(requests)
        pending = list(enumerate(requests))
        while pending:
            # One wave: at most one request per stream (the carry is a
            # dependency within a stream) and at most batch_size lanes;
            # leftovers serialize into the next wave. A bare RESET touches
            # EVERY stream and a RELOAD swaps the params, so both are
            # barriers: each rides a wave alone, and nothing after one may
            # be pulled into an earlier wave.
            wave, rest, seen = [], [], set()
            barrier = False
            for i, fields in pending:
                if barrier:
                    rest.append((i, fields))
                    continue
                if len(fields) == 1 and fields[0] in ("RESET", "RELOAD"):
                    barrier = True
                    if wave:
                        rest.append((i, fields))
                    else:
                        wave.append((i, fields))
                    continue
                sid = (fields[2] if len(fields) > 2 else "") or "0"
                if sid in seen or len(wave) == batch_size:
                    rest.append((i, fields))
                else:
                    seen.add(sid)
                    wave.append((i, fields))
            pending = rest

            # lane: (result idx, in_path, out, sid, bucket, frame u8, old f32)
            # Serial pass: parse + commands + stream-bucket bookkeeping
            # (mutates shared stream state, must stay in request order);
            # frame decode then rides the shared IO pool (pure per path).
            jobs = []
            for i, fields in wave:
                try:
                    in_path, explicit_out, sid, size_field = parse(fields)
                    if in_path == "RELOAD" and len(fields) == 1:
                        results[i] = reload()
                        continue
                    if in_path == "RESET":
                        if len(fields) == 2 or (len(fields) > 3 and fields[3]):
                            raise ValueError(
                                "RESET takes no OUTPUT/SIZE field; use RESET "
                                "or RESET\\t\\t<stream>"
                            )
                        if len(fields) > 2:
                            carries.pop(sid)
                            results[i] = f"RESET {sid}"
                        else:
                            results[i] = reset_all()
                        continue
                    bucket = stream_bucket(sid, size_field)
                    jobs.append((i, in_path, explicit_out, sid, bucket))
                except Exception as exc:  # noqa: BLE001 - answered per-request
                    results[i] = exc

            def decode(job):
                try:
                    return job, load_frame(job[1], job[4]), None
                except Exception as exc:  # noqa: BLE001 - answered per-request
                    return job, None, exc

            by_bucket: dict = {}
            n_lanes = 0
            for job, frame, exc in daemon.io_pool().map(decode, jobs):
                i, in_path, explicit_out, sid, bucket = job
                if exc is not None:
                    results[i] = exc
                    continue
                by_bucket.setdefault(bucket, []).append(
                    (i, in_path, explicit_out, sid, bucket, frame[0])
                )
                n_lanes += 1
            if not n_lanes:
                continue
            for bucket, lanes in by_bucket.items():
                if len(lanes) == 1:
                    i, in_path, explicit_out, sid, bkt, frame = lanes[0]
                    try:
                        frame_dev = jnp.asarray(frame[None])
                        old_dev = carries.get_old(sid)
                        if old_dev is None:
                            old_dev = norm(frame_dev)
                        results[i] = run_single(
                            in_path, explicit_out, sid, bkt,
                            frame_dev, old_dev, protected=seen,
                        )
                    except Exception as exc:  # noqa: BLE001
                        results[i] = exc
                    continue
                # Slot-table wave: ONE gather assembles olds, ONE scatter
                # seeds fresh streams, ONE scatter commits outputs — all
                # at the static [batch_size] shape (padding and non-fresh
                # lanes point at the scratch row), so lane count never
                # adds dispatches and the f32 carries never leave device.
                scratch = carries.scratch(bucket)
                slots, fresh = [], []
                for _, _, _, sid, _, _ in lanes:
                    is_fresh = sid not in carries
                    slots.append(
                        carries.allocate(sid, bucket, protected=seen)
                        if is_fresh else carries.slot_of(sid))
                    fresh.append(is_fresh)
                frames = np.stack([l[5] for l in lanes])
                padn = batch_size - len(lanes)
                if padn:
                    frames = np.concatenate(
                        [frames, np.repeat(frames[-1:], padn, axis=0)]
                    )
                lane_idx = jnp.asarray(
                    np.asarray(slots + [slots[-1]] * padn, np.int32))
                fresh_idx = jnp.asarray(np.asarray(
                    [s if f else scratch for s, f in zip(slots, fresh)]
                    + [scratch] * padn, np.int32))
                try:
                    placed = place(frames)
                    # a fresh stream's first frame pairs with itself:
                    # seed its slot with the normalized frame, then one
                    # gather serves every lane
                    carries.scatter(bucket, fresh_idx, norm(placed))
                    olds = place(jnp.take(
                        carries.buffers[bucket], lane_idx, axis=0))
                    out_model, out_u8 = step(state["params"], placed, olds)
                    out_u8 = np.asarray(out_u8)[: len(lanes)]
                except Exception as exc:  # noqa: BLE001
                    # ERR only THIS wave's lanes: earlier waves already saved
                    # outputs and advanced their carries — answering the whole
                    # group ERR would tell the client those succeeded requests
                    # failed ("failed requests do NOT advance the carry" must
                    # stay true per request, not per group).
                    for lane in lanes:
                        results[lane[0]] = exc
                    for s, f in zip(slots, fresh):
                        if f:
                            carries.release(bucket, s)
                    continue
                # PNG encodes ride the IO pool; slot/LRU bookkeeping stays
                # serial. A failed save does NOT advance that lane's carry:
                # its output row scatters to scratch (a warm lane's stored
                # carry is untouched; a fresh lane's tentative slot is
                # returned).
                def encode(k):
                    i, in_path, explicit_out, sid, bkt, _ = lanes[k]
                    try:
                        out_file = daemon.resolve_out_path(
                            explicit_out, out_dir, default_name(in_path, sid)
                        )
                        img_utils.save_uint8(out_u8[k], out_file)
                        return k, out_file, None
                    except Exception as exc:  # noqa: BLE001
                        return k, None, exc

                out_slots = np.full(batch_size, scratch, np.int32)
                outcomes = list(daemon.io_pool().map(
                    encode, range(len(lanes))))
                for k, out_file, exc in outcomes:
                    if exc is None:
                        out_slots[k] = slots[k]
                carries.scatter(bucket, jnp.asarray(out_slots), out_model)
                for k, out_file, exc in outcomes:
                    i, _, _, sid, bkt, _ = lanes[k]
                    if exc is not None:
                        results[i] = exc
                        if fresh[k]:
                            carries.release(bucket, slots[k])
                        continue
                    carries.commit(sid, bkt, slots[k])
                    results[i] = out_file
        return results

    return daemon.run_batched_request_loop(
        handle_batch, batch_size, stdin=stdin, stdout=stdout,
        name="video serve",
    )
