"""``video_st`` CLI — video style transfer (train / convert-video).

Mirrors the reference group (clis/video_st.py:11-87): ``train`` with the
extra ``-tw/--temporal-weight`` and ``--use-pretrained-fast-st`` options,
and ``convert-video`` with ``--fps``.
"""

import os

import click

from styletransfer_tpu import constants
from styletransfer_tpu.clis import common
from styletransfer_tpu.engines import httpserve, netserve
from styletransfer_tpu.utils.logging import get_logger

LOGGER = get_logger()


@click.group()
def video_st():
    """Video Style Transfer"""


@video_st.command()
@click.argument("style-image-path")
@click.option("-e", "--epochs", default=50,
              help="How many epochs the training will take")
@click.option("-b", "--batch-size", default=4, help="Batch size for training")
@click.option("-cw", "--content-weight", default=1,
              help="The weight we will assign to the content loss during the optimization")
@click.option("-sw", "--style-weight", default=100_000,
              help="The weight we will assign to the style loss during the optimization")
@click.option("-tw", "--temporal-weight", default=0.8,
              help="The weight we will assign to the temporal loss during the optimization")
@click.option("--use-pretrained-fast-st", is_flag=True,
              help="States whether we want to start training the video model from "
                   "pretrained fast style transfer weights (which was trained on the "
                   "same style name)")
@click.option("--precision", default="f32", type=click.Choice(["f32", "bf16"]),
              help="Activation precision (params/optimizer stay f32)")
@click.option("--step-checkpoint-every", default=None, type=int,
              help="Also save mid-epoch resumable state every N frame updates")
@click.option("--distributed", is_flag=True, default=False,
              help="Initialize jax.distributed for a multi-host run "
                   "(see `fast_st train --help`)")
@click.option("--global-batch", default=None, type=str,
              help="'auto' = -b is per-chip (global = b x device count), or "
                   "an explicit global batch (see `fast_st train --help`)")
def train(style_image_path, epochs, batch_size, content_weight, style_weight,
          temporal_weight, use_pretrained_fast_st, precision,
          step_checkpoint_every, distributed, global_batch):
    """
    Perform the training for the video style transfer network. A checkpoint
    will be created at the end of each epoch in the `data/models/` directory.

    Optionally warm-starts from pretrained fast style transfer weights of the
    same style name (latest epoch).
    """
    if distributed:
        # Must run before any JAX backend touch.
        from styletransfer_tpu.parallel import distributed as dist

        dist.initialize()

    from styletransfer_tpu.parallel import mesh as mesh_lib

    batch_size = mesh_lib.resolve_global_batch(batch_size, global_batch)

    import jax.numpy as jnp

    from styletransfer_tpu.engines import video
    from styletransfer_tpu.utils import images

    style_name = style_image_path.split("/")[-1]
    LOGGER.info("Training video style transfer network with style name: %s", style_name)

    style_image_path = os.path.join(constants.PROJECT_ROOT_PATH, style_image_path)
    style_image = jnp.asarray(images.load_image(style_image_path))

    video.video_train(
        style_image,
        style_name=style_name,
        epochs=epochs,
        batch_size=batch_size,
        style_weight=style_weight,
        content_weight=content_weight,
        temporal_weight=temporal_weight,
        use_pretrained_fast_st=use_pretrained_fast_st,
        precision=precision,
        step_checkpoint_every=step_checkpoint_every,
    )


@video_st.command()
@click.argument("video-path")
@click.argument("style-name")
@click.option("-o", "--out-dir", default="results/",
              help="The results directory where the converted style will be saved")
@click.option("--fps", default=24.0,
              help="The FPS that will be used when saving the transformed video")
@click.option("--precision", default="f32", type=click.Choice(["f32", "bf16"]),
              help="Activation precision")
@click.option("--pad-mode", default="reflect", type=click.Choice(["reflect", "zeros"]),
              help="Conv padding. Use 'zeros' for checkpoints trained by the "
                   "ORIGINAL reference code (its pinned torch 1.1.0 silently "
                   "used zero padding despite the 'reflection' string)")
@click.option("--save-frames", is_flag=True, default=False,
              help="Also save each stylized frame as {i}.png in --workdir "
                   "(the reference always does this — network.py:1133-1134; "
                   "here it is opt-in since the mux no longer needs the "
                   "PNG round-trip)")
@click.option("--workdir", default="workdir/",
              help="Frame directory for --save-frames")
def convert_video(video_path, style_name, out_dir, fps, precision, pad_mode,
                  save_frames, workdir):
    """
    Converts the video at `video-path` using the network pretrained with
    `style-name` and saves the resulting transformed video in `out-dir`.

    A pretrained model should exist in `data/models/` for the specified
    `style-name`.
    """
    from styletransfer_tpu.engines import video

    video.process_video(
        video_path=video_path, style_name=style_name, out_dir=out_dir,
        fps=fps, precision=precision, pad_mode=pad_mode,
        save_frames=save_frames, working_dir=workdir,
    )


@video_st.command("convert-dir")
@click.argument("input-dir")
@click.argument("style-name")
@click.option("-b", "--batch-size", default=4,
              help="Clips stylized together per scanned program (one carry "
                   "lane each; per-clip outputs identical to one-at-a-time)")
@click.option("-o", "--out-dir", default="results/",
              help="The results directory where converted videos are saved")
@click.option("--fps", default=24.0,
              help="The FPS that will be used when saving the transformed videos")
@click.option("--precision", default="f32", type=click.Choice(["f32", "bf16"]),
              help="Activation precision")
@click.option("--pad-mode", default="reflect", type=click.Choice(["reflect", "zeros"]),
              help="Conv padding. Use 'zeros' for checkpoints trained by the "
                   "ORIGINAL reference code")
def convert_dir(input_dir, style_name, batch_size, out_dir, fps, precision,
                pad_mode):
    """
    Converts every video in `input-dir` (gif/mp4/avi/mov/webm/mkv) using the
    network pretrained with `style-name` — batched serving for video: several
    clips advance in lockstep through one compiled recurrent scan. Outputs
    are saved as `video_st_{style}_{name}.mp4` (or `.gif`) in `out-dir`.
    """
    from styletransfer_tpu.engines import video

    video.process_video_dir(
        input_dir=input_dir, style_name=style_name, batch_size=batch_size,
        out_dir=out_dir, fps=fps, precision=precision, pad_mode=pad_mode,
    )


@video_st.command()
@click.argument("style-name")
@click.option("-o", "--out-dir", default="results/",
              help="Default results directory for requests without an "
                   "explicit output path")
@click.option("--size", default=None, type=int,
              help="Working resolution (default 256); all frames are "
                   "resized to it so they share one compiled program")
@click.option("--precision", default="f32", type=click.Choice(["f32", "bf16"]),
              help="Activation precision")
@click.option("--pad-mode", default="reflect", type=click.Choice(["reflect", "zeros"]),
              help="Conv padding. Use 'zeros' for checkpoints trained by the "
                   "ORIGINAL reference code")
@click.option("-b", "--batch-size", default=1, type=click.IntRange(min=1),
              help="Cross-STREAM dynamic batching: pending requests for "
                   "different streams run as one device call (same-stream "
                   "requests serialize — the carry is a dependency). 1 = "
                   "strictly serial.")
@click.option("--max-streams", default=64, type=click.IntRange(min=1),
              help="LRU cap on concurrently-held stream carries")
@click.option("--sizes", default=None, metavar="S1,S2,...",
              help="Multi-resolution serving buckets (e.g. 256,512): one "
                   "program set per size compiles before READY. A stream's "
                   "bucket is fixed by its FIRST frame's optional fourth "
                   "field (FRAME<TAB>OUTPUT<TAB>STREAM<TAB>512; absent = "
                   "the first listed) and remembered — RESET the stream to "
                   "change it. Overrides --size.")
@click.option("--tcp", default=None, metavar="[HOST:]PORT",
              help=netserve.TCP_HELP + " Each connection can carry its "
                   "own STREAM ids; clients share one id namespace.")
@click.option("--http", default=None, metavar="[HOST:]PORT",
              help=httpserve.HTTP_HELP + " Route frames to streams with "
                   "?stream=ID; POST /reset[?stream=ID] drops carries.")
def serve(style_name, out_dir, size, precision, pad_mode, batch_size,
          max_streams, sizes, tcp, http):
    """
    Warm-process STREAMING stylization daemon: compiles the recurrent step
    once, prints `READY`, then stylizes one frame per stdin line until EOF
    or a blank line — the previous stylized frame is kept in device memory
    between requests, so consecutive requests form one temporally-consistent
    stream (a live camera/capture source that cannot be batch-scanned).

    Each line is `FRAME_PATH[<TAB>OUTPUT_PATH[<TAB>STREAM]]`; the optional
    STREAM field serves several concurrent streams (each with its own
    carry) through one daemon. `RESET` starts everything fresh;
    `RESET<TAB><TAB>STREAM` resets one stream; `RELOAD` swaps in the
    latest checkpoint without recompiling (carries survive). Each
    response line is `OK <output_path>`, `OK RESET`, or
    `ERR <input>: <reason>`.
    """
    from styletransfer_tpu.engines import video

    size_list = common.parse_sizes_option(sizes)

    def run(stdin, stdout):
        return video.serve_stream_loop(
            style_name=style_name, out_dir=out_dir, size=size,
            precision=precision, pad_mode=pad_mode, batch_size=batch_size,
            max_streams=max_streams, sizes=size_list, stdin=stdin,
            stdout=stdout,
        )

    try:
        httpserve.serve_transport(run, tcp, http, "video", "video")
    except ValueError as exc:
        raise click.UsageError(str(exc))
