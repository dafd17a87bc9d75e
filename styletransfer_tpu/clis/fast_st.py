"""``fast_st`` CLI — feed-forward style transfer (train / convert-image).

Mirrors the reference group (clis/fast_st.py:11-63): ``train`` with
epochs/batch-size/weights options (style name = basename of the style path,
clis/fast_st.py:31) and ``convert-image`` loading the latest checkpoint for
a style name.
"""

import os

import click

from styletransfer_tpu import constants
from styletransfer_tpu.clis import common
from styletransfer_tpu.engines import httpserve, netserve
from styletransfer_tpu.utils.logging import get_logger

LOGGER = get_logger()


@click.group()
def fast_st():
    """Fast Style Transfer"""


@fast_st.command()
@click.argument("style-image-path")
@click.option("-e", "--epochs", default=50,
              help="How many epochs the training will take")
@click.option("-b", "--batch-size", default=4, help="Batch size for training")
@click.option("-cw", "--content-weight", default=1,
              help="The weight we will assign to the content loss during the optimization")
@click.option("-sw", "--style-weight", default=100_000,
              help="The weight we will assign to the style loss during the optimization")
@click.option("--packed", default=None, type=str,
              help="Path to a packed dataset file (see data.packed.pack_images); "
                   "zero-decode mmap reads instead of per-image JPEG decode")
@click.option("--step-checkpoint-every", default=None, type=int,
              help="Also save mid-epoch resumable state every N steps")
@click.option("--precision", default="f32", type=click.Choice(["f32", "bf16"]),
              help="Activation precision (params/optimizer stay f32)")
@click.option("--distributed", is_flag=True, default=False,
              help="Initialize jax.distributed for a multi-host run "
                   "(coordinator/rank from STX_COORDINATOR_ADDRESS / "
                   "STX_NUM_PROCESSES / STX_PROCESS_ID; BATCH-SIZE is the "
                   "GLOBAL batch)")
@click.option("--global-batch", default=None, type=str,
              help="DP scaling opt-in: 'auto' treats -b as PER-CHIP batch "
                   "(global = b x device count, every chip busy), or an "
                   "explicit global batch size. Default: -b is the global "
                   "batch (reference semantics; extra chips may idle). Adam "
                   "lr stays at the reference default either way.")
def train(style_image_path, epochs, batch_size, content_weight, style_weight,
          packed, step_checkpoint_every, precision, distributed, global_batch):
    """
    Perform the training for the fast style transfer network. A checkpoint
    will be created at the end of each epoch in the `data/models/` directory.
    """
    if distributed:
        # Must run before any JAX backend touch.
        from styletransfer_tpu.parallel import distributed as dist

        dist.initialize()

    from styletransfer_tpu.parallel import mesh as mesh_lib

    batch_size = mesh_lib.resolve_global_batch(batch_size, global_batch)

    import jax.numpy as jnp

    from styletransfer_tpu.engines import fast
    from styletransfer_tpu.utils import images

    style_name = style_image_path.split("/")[-1]
    LOGGER.info("Training fast style transfer network with style name: %s", style_name)

    style_image_path = os.path.join(constants.PROJECT_ROOT_PATH, style_image_path)
    style_image = jnp.asarray(images.load_image(style_image_path))

    loaders = {}
    if packed:
        from styletransfer_tpu.data.packed import get_packed_loader

        if not os.path.isabs(packed):
            packed = os.path.join(constants.PROJECT_ROOT_PATH, packed)
        test_loader, train_loader = get_packed_loader(
            packed, batch_size=batch_size, test_split=0.10, test_limit=20
        )
        loaders = {"test_loader": test_loader, "train_loader": train_loader}

    fast.static_train(
        style_image,
        style_name=style_name,
        epochs=epochs,
        batch_size=batch_size,
        style_weight=style_weight,
        content_weight=content_weight,
        step_checkpoint_every=step_checkpoint_every,
        precision=precision,
        **loaders,
    )


@fast_st.command()
@click.argument("style-image-paths", nargs=-1, required=True)
@click.option("-n", "--name", default="multi", help="Name for the multi-style model")
@click.option("-e", "--epochs", default=50)
@click.option("-b", "--batch-size", default=4)
@click.option("-cw", "--content-weight", default=1)
@click.option("-sw", "--style-weight", default=100_000)
@click.option("--packed", default=None, type=str,
              help="Path to a packed dataset file (see data.packed.pack_images); "
                   "zero-decode mmap reads instead of per-image JPEG decode")
@click.option("--step-checkpoint-every", default=None, type=int,
              help="Also save mid-epoch resumable state every N steps")
@click.option("--precision", default="f32", type=click.Choice(["f32", "bf16"]))
@click.option("--distributed", is_flag=True, default=False,
              help="Initialize jax.distributed for a multi-host run "
                   "(see `fast_st train --help`)")
@click.option("--global-batch", default=None, type=str,
              help="'auto' = -b is per-chip (global = b x device count), or "
                   "an explicit global batch (see `fast_st train --help`)")
def train_multi(style_image_paths, name, epochs, batch_size, content_weight,
                style_weight, packed, step_checkpoint_every, precision,
                distributed, global_batch):
    """
    Train ONE network on MULTIPLE styles (conditional instance norm).

    Pass several style image paths; at inference select a style by index or
    blend styles continuously (`convert-image-multi`). Checkpoints are saved
    as `fast_multi_st_{name}_epoch{e}.msgpack`.
    """
    if distributed:
        from styletransfer_tpu.parallel import distributed as dist

        dist.initialize()

    from styletransfer_tpu.parallel import mesh as mesh_lib

    batch_size = mesh_lib.resolve_global_batch(batch_size, global_batch)

    import jax.numpy as jnp
    import numpy as np

    from styletransfer_tpu.engines import multistyle as ms
    from styletransfer_tpu.utils import images

    stack = np.concatenate(
        [
            images.load_image(os.path.join(constants.PROJECT_ROOT_PATH, p))
            for p in style_image_paths
        ],
        axis=0,
    )
    loaders = {}
    if packed:
        from styletransfer_tpu.data.packed import get_packed_loader

        if not os.path.isabs(packed):
            packed = os.path.join(constants.PROJECT_ROOT_PATH, packed)
        test_loader, train_loader = get_packed_loader(
            packed, batch_size=batch_size, test_split=0.10, test_limit=20
        )
        loaders = {"test_loader": test_loader, "train_loader": train_loader}
    LOGGER.info("Training multi-style network '%s' on %d styles", name, len(stack))
    ms.train(
        jnp.asarray(stack), style_name=name, epochs=epochs, batch_size=batch_size,
        style_weight=style_weight, content_weight=content_weight,
        step_checkpoint_every=step_checkpoint_every,
        precision=precision,
        **loaders,
    )


@fast_st.command()
@click.argument("image-path")
@click.argument("name")
@click.option("--style-index", default=0, help="Which trained style to apply")
@click.option("--blend", default=None,
              help="Comma-separated style weights (overrides --style-index), e.g. '0.5,0.5'")
@click.option("-o", "--out-dir", default="results/")
@click.option("--num-styles", required=True, type=int,
              help="Number of styles the checkpoint was trained with")
def convert_image_multi(image_path, name, style_index, blend, out_dir, num_styles):
    """
    Stylize an image with a multi-style network trained by `train-multi`,
    selecting a style by index or blending several.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from styletransfer_tpu import ckpt
    from styletransfer_tpu.engines import multistyle as ms
    from styletransfer_tpu.models import multistyle
    from styletransfer_tpu.utils import images

    template = multistyle.init_params(jax.random.PRNGKey(0), num_styles=num_styles)
    params, _ = ckpt.load_latest_transformer(ms.MODEL_NAME, name, template)

    img = jnp.asarray(
        images.load_image(os.path.join(constants.PROJECT_ROOT_PATH, image_path))
    )
    if blend:
        w = np.asarray([float(v) for v in blend.split(",")], dtype=np.float32)
        w = w / w.sum()
        out = ms.stylize_blend(params, img, jnp.asarray(w)[None])
        tag = "blend"
    else:
        out = ms.stylize(params, img, jnp.asarray([style_index], dtype=jnp.int32))
        tag = f"style{style_index}"

    out_dir = os.path.join(constants.PROJECT_ROOT_PATH, out_dir)
    os.makedirs(out_dir, exist_ok=True)
    out_file = os.path.join(out_dir, f"converted_fast_multi_st_{name}_{tag}.png")
    images.save_image(np.asarray(out), out_file)
    LOGGER.info("Saved stylized image to %s", out_file)


@fast_st.command()
@click.argument("image-dir")
@click.argument("out-path")
@click.option("--size", default=256, help="Crop size for packed images")
@click.option("--limit", default=None, type=int, help="Max images to pack")
def pack_dataset(image_dir, out_path, size, limit):
    """
    Pack a directory of images into a single memory-mapped dataset file for
    zero-decode training (use with `fast_st train --packed OUT_PATH`).

    Each image is center-cropped square, resized to SIZE and stored as raw
    uint8; non-RGB and unreadable files are skipped.
    """
    from styletransfer_tpu.data.packed import pack_images

    image_dir = os.path.join(constants.PROJECT_ROOT_PATH, image_dir)
    out_path = os.path.join(constants.PROJECT_ROOT_PATH, out_path)
    n = pack_images(image_dir, out_path, size=size, limit=limit)
    LOGGER.info("Packed %d images into %s", n, out_path)


@fast_st.command()
@click.argument("image-path")
@click.argument("style-name")
@click.option("-o", "--out-dir", default="results/",
              help="The results directory where the converted image will be saved")
@click.option("--size", default=None, type=int,
              help="Working resolution (default 256; the net is fully convolutional)")
@click.option("--precision", default="f32", type=click.Choice(["f32", "bf16"]),
              help="Activation precision")
@click.option("--pad-mode", default="reflect", type=click.Choice(["reflect", "zeros"]),
              help="Conv padding. Use 'zeros' for checkpoints trained by the "
                   "ORIGINAL reference code (its pinned torch 1.1.0 silently "
                   "used zero padding despite the 'reflection' string)")
def convert_image(image_path, style_name, out_dir, size, precision, pad_mode):
    """
    Converts the image at `image-path` using the network pretrained with
    `style-name` and saves the resulting transformed image in `out-dir`.

    A pretrained model should exist in `data/models/` for the specified
    `style-name` (e.g. `fast_st_the_great_wave_epoch1.msgpack`; reference
    `.pth` checkpoints are read too).
    """
    from styletransfer_tpu.engines import fast

    fast.process_image(
        image_path=image_path, style_name=style_name, out_dir=out_dir,
        size=size, precision=precision, pad_mode=pad_mode,
    )


@fast_st.command("convert-dir")
@click.argument("input-dir")
@click.argument("style-name")
@click.option("-b", "--batch-size", default=64,
              help="Inference batch size (one compiled program; the ragged "
                   "tail batch is padded and sliced)")
@click.option("-o", "--out-dir", default="results/",
              help="The results directory where converted images are saved")
@click.option("--size", default=None, type=int,
              help="Working resolution (default 256; the net is fully convolutional)")
@click.option("--precision", default="f32", type=click.Choice(["f32", "bf16"]),
              help="Activation precision")
@click.option("--pad-mode", default="reflect", type=click.Choice(["reflect", "zeros"]),
              help="Conv padding. Use 'zeros' for checkpoints trained by the "
                   "ORIGINAL reference code")
def convert_dir(input_dir, style_name, batch_size, out_dir, size, precision,
                pad_mode):
    """
    Converts every image in `input-dir` (png/jpg/jpeg/bmp/webp) using the
    network pretrained with `style-name` — the batched serving path: one
    checkpoint load, one compiled program, threaded host decode. Outputs are
    saved as `converted_fast_st_{style}_{name}.png` in `out-dir`.
    """
    from styletransfer_tpu.engines import fast

    fast.process_dir(
        input_dir=input_dir, style_name=style_name, batch_size=batch_size,
        out_dir=out_dir, size=size, precision=precision, pad_mode=pad_mode,
    )


@fast_st.command()
@click.argument("style-name")
@click.option("-o", "--out-dir", default="results/",
              help="Default results directory for requests without an "
                   "explicit output path")
@click.option("--size", default=None, type=int,
              help="Working resolution (default 256); all requests are "
                   "resized to it so they share one compiled program")
@click.option("--sizes", default=None, metavar="S1,S2,...",
              help="Multi-resolution serving buckets (e.g. 256,512): one "
                   "program per size is compiled before READY, and a "
                   "request's optional third field picks its bucket "
                   "(INPUT<TAB>OUTPUT<TAB>512; absent = the first listed). "
                   "Overrides --size.")
@click.option("--precision", default="f32", type=click.Choice(["f32", "bf16"]),
              help="Activation precision")
@click.option("--pad-mode", default="reflect", type=click.Choice(["reflect", "zeros"]),
              help="Conv padding. Use 'zeros' for checkpoints trained by the "
                   "ORIGINAL reference code")
@click.option("-b", "--batch-size", default=1,
              type=click.IntRange(min=1),
              help="Dynamic batching: serve up to N already-queued requests "
                   "per device call (lone requests keep single-request "
                   "latency; piped bursts get batched throughput; with "
                   "--sizes, a group runs one call per bucket present)")
@click.option("--tcp", default=None, metavar="[HOST:]PORT",
              help=netserve.TCP_HELP)
@click.option("--http", default=None, metavar="[HOST:]PORT",
              help=httpserve.HTTP_HELP)
def serve(style_name, out_dir, size, sizes, precision, pad_mode, batch_size,
          tcp, http):
    """
    Warm-process stylization daemon: compiles the serving program once,
    prints `READY`, then stylizes one image per stdin line until EOF or a
    blank line. Each line is `INPUT_PATH` or `INPUT_PATH<TAB>OUTPUT_PATH`;
    each response line is `OK <output_path>` or `ERR <input>: <reason>`.
    A `RELOAD` line swaps in the latest checkpoint without recompiling
    (zero-downtime model updates).

    Keeping one process warm is the cold-start answer on backends where
    compiles are expensive (docs/serving.md): after `READY`, every request
    costs only milliseconds of execute + image IO.
    """
    from styletransfer_tpu.engines import fast

    size_list = common.parse_sizes_option(sizes)

    def run(stdin, stdout):
        return fast.serve_loop(
            style_name=style_name, out_dir=out_dir, size=size,
            precision=precision, pad_mode=pad_mode, batch_size=batch_size,
            sizes=size_list, stdin=stdin, stdout=stdout,
        )

    try:
        httpserve.serve_transport(run, tcp, http, "fast", "fast")
    except ValueError as exc:
        raise click.UsageError(str(exc))


@fast_st.command("serve-multi")
@click.argument("name")
@click.option("--num-styles", required=True, type=int,
              help="Number of styles the checkpoint was trained with")
@click.option("-o", "--out-dir", default="results/",
              help="Default results directory for requests without an "
                   "explicit output path")
@click.option("--size", default=None, type=int,
              help="Working resolution (default 256); all requests are "
                   "resized to it so they share one compiled program")
@click.option("--sizes", default=None, metavar="S1,S2,...",
              help="Multi-resolution serving buckets (e.g. 256,512): one "
                   "program per size is compiled before READY, and a "
                   "request's optional fourth field picks its bucket "
                   "(INPUT<TAB>OUTPUT<TAB>STYLE<TAB>512; absent = the "
                   "first listed). Overrides --size.")
@click.option("--precision", default="f32", type=click.Choice(["f32", "bf16"]),
              help="Activation precision")
@click.option("-b", "--batch-size", default=1,
              type=click.IntRange(min=1),
              help="Dynamic batching: serve up to N already-queued requests "
                   "per device call (mixed styles/blends batch together — "
                   "the style is per-sample data; with --sizes, a group "
                   "runs one call per bucket present)")
@click.option("--tcp", default=None, metavar="[HOST:]PORT",
              help=netserve.TCP_HELP)
@click.option("--http", default=None, metavar="[HOST:]PORT",
              help=httpserve.HTTP_HELP)
def serve_multi(name, num_styles, out_dir, size, sizes, precision,
                batch_size, tcp, http):
    """
    Warm-process MULTI-STYLE daemon for a network trained by `train-multi`:
    compiles one program, prints `READY`, then stylizes one image per stdin
    line until EOF or a blank line — each request picks its own style or
    blend, as data, with no recompile.

    Each line is `INPUT[<TAB>OUTPUT[<TAB>STYLE]]` where STYLE is an index
    (`2`) or comma-separated blend weights (`0.3,0.7`); leave OUTPUT empty
    (two TABs) to use the default naming. Responses: `OK <output_path>` or
    `ERR <input>: <reason>`. A `RELOAD` line swaps in the latest
    checkpoint without recompiling.
    """
    from styletransfer_tpu.engines import multistyle as ms

    size_list = common.parse_sizes_option(sizes)

    def run(stdin, stdout):
        return ms.serve_loop(
            name=name, num_styles=num_styles, out_dir=out_dir, size=size,
            precision=precision, batch_size=batch_size, sizes=size_list,
            stdin=stdin, stdout=stdout,
        )

    try:
        httpserve.serve_transport(run, tcp, http, "multi", "multi")
    except ValueError as exc:
        raise click.UsageError(str(exc))
