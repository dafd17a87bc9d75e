"""``gatys_st`` CLI — optimization-based style transfer.

Mirrors the reference command (clis/gatys_st.py:11-48): positional content
and style image paths, ``-n/--out-name`` (default ``gatys_converted.png``),
``-s/--steps`` (default 300), ``-cw``/``-sw`` weights. Adds TPU-native
options for the optimizer choice (on-device scanned Adam vs. L-BFGS).
"""

import os

import click

from styletransfer_tpu import constants
from styletransfer_tpu.engines import httpserve, netserve
from styletransfer_tpu.utils.logging import get_logger

LOGGER = get_logger()


@click.command()
@click.argument("content-image-path", required=False)
@click.argument("style-image-path", required=False)
@click.option("-n", "--out-name", default="gatys_converted.png",
              help="The name of the result file (transformed image)")
@click.option("-s", "--steps", default=300,
              help="How many iterations should the optimization go through.")
@click.option("-cw", "--content-weight", default=1,
              help="The weight we will assign to the content loss during the optimization")
@click.option("-sw", "--style-weight", default=100_000,
              help="The weight we will assign to the style loss during the optimization")
@click.option("--optimizer", default="lbfgs",
              type=click.Choice(["adam", "lbfgs", "lbfgs-zoom"]),
              help="On-device optimizer for the pixel optimization. lbfgs "
                   "replicates the reference's torch LBFGS contract exactly "
                   "(network.py:435: ~20 inner iterations per step); "
                   "lbfgs-zoom is optax L-BFGS with linesearch (1 update "
                   "per step); adam is fastest per step on TPU.")
@click.option("-b", "--batch", default=0, type=click.IntRange(min=0),
              help="If CONTENT-IMAGE-PATH is a directory, stylize up to this "
                   "many images from it in ONE batched on-device "
                   "optimization (0 = all).")
@click.option("--learning-rate", default=0.05, help="Adam learning rate")
@click.option("--history-size", default=None, type=click.IntRange(min=1),
              help="L-BFGS history length H (lbfgs optimizer only). "
                   "Default: 100 (torch's default — the reference contract) "
                   "for one-shot runs, 16 for --serve daemons (1.63x "
                   "per-request throughput at b8; style-space feature delta "
                   "measured BELOW H=100's own trajectory-chaos floor, so "
                   "the outputs are perceptually equivalent — "
                   "docs/performance.md has the measured decision). Pass "
                   "an explicit value to override either mode.")
@click.option("--history-math", default="compact",
              type=click.Choice(["compact", "two_loop"]),
              help="L-BFGS direction computation (lbfgs optimizer only): "
                   "compact is the Byrd-Nocedal form (~2x faster on TPU, "
                   "same operator); two_loop is torch's literal recursion "
                   "for bit-level fidelity.")
@click.option("--coarse-steps", default=0, type=click.IntRange(min=0),
              help="Coarse-to-fine: run this many steps at --coarse-scale "
                   "resolution first and warm-start the full run from the "
                   "upsampled result (0 = off, the reference trajectory).")
@click.option("--coarse-scale", default=0.5,
              type=click.FloatRange(min=0.1, max=0.9),
              help="Resolution factor of the coarse stage")
@click.option("--precision", default="f32", type=click.Choice(["f32", "bf16"]),
              help="VGG tower activation precision (bf16 is faster; pixels stay f32)")
@click.option("--size", default=None, type=int,
              help="Working resolution (default 256)")
@click.option("--serve", is_flag=True, default=False,
              help="Warm-process daemon mode: compile once, print READY, "
                   "then run one optimization per stdin line "
                   "(CONTENT<TAB>STYLE[<TAB>OUTPUT]) until EOF or a blank "
                   "line. The positional image paths are omitted. "
                   "Optimizer/steps/weights are compiled into the daemon. "
                   "With -b N, pending requests group into one vmapped "
                   "device call of N independent lanes (styles may mix). "
                   "STYLE may be a blend spec a.png,b.png[:0.3,0.7] — "
                   "weighted-average Gram targets, no recompile.")
@click.option("--tcp", default=None, metavar="[HOST:]PORT",
              help="(--serve only) " + netserve.TCP_HELP)
@click.option("--http", default=None, metavar="[HOST:]PORT",
              help="(--serve only) " + httpserve.HTTP_HELP + " The content "
                   "image is the POST body; ?style= names a server-side "
                   "style path or blend spec.")
def gatys_st(content_image_path, style_image_path, out_name, steps,
             content_weight, style_weight, optimizer, batch, learning_rate,
             history_size, history_math, coarse_steps, coarse_scale,
             precision, size, serve, tcp, http):
    """
    Run the original Gatys style transfer. Both `style-image` and
    `content-image` should be the paths to the image we want to take the
    content from and the one we want to take the style from (respectively).

    CONTENT-IMAGE-PATH may also be a directory: every image in it is
    stylized in a single batched on-device optimization (see --batch).

    STYLE-IMAGE-PATH may be a blend spec `a.png,b.png[:0.3,0.7]`: the
    style targets become the weighted average of the listed styles'
    Gram matrices (weights normalized; omitted = equal).
    """
    # Mode-dependent H default (measured decision, docs/performance.md):
    # one-shot keeps torch's H=100 contract; daemons default to H=16 —
    # 1.63x per-request throughput with feature-space deltas below the
    # contract run's own chaos floor. Explicit --history-size wins in
    # both modes (e.g. --serve --history-size 100 restores bit-parity
    # with the one-shot CLI program).
    if history_size is None:
        history_size = 16 if serve else 100
    if serve:
        if coarse_steps:
            raise click.UsageError(
                "--coarse-steps is not supported in --serve mode (the "
                "daemon compiles one optimization program; wire it after "
                "the on-TPU quality-vs-time curve justifies a second "
                "compiled stage — see docs/performance.md)."
            )
        from styletransfer_tpu.engines import gatys

        def run(stdin, stdout):
            return gatys.serve_loop(
                steps=steps, style_weight=style_weight,
                content_weight=content_weight, optimizer=optimizer,
                learning_rate=learning_rate, history_size=history_size,
                history_math=history_math,
                precision=precision, size=size, batch=max(batch, 1),
                stdin=stdin, stdout=stdout,
            )

        try:
            httpserve.serve_transport(run, tcp, http, "gatys", "gatys")
        except ValueError as exc:
            raise click.UsageError(str(exc))
        return
    if tcp is not None or http is not None:
        raise click.UsageError("--tcp/--http require --serve (daemon mode).")
    if not content_image_path or not style_image_path:
        raise click.UsageError(
            "CONTENT-IMAGE-PATH and STYLE-IMAGE-PATH are required "
            "(or pass --serve for daemon mode)."
        )
    # Heavy imports deferred so `--help` stays instant.
    import numpy as np

    import jax.numpy as jnp

    from styletransfer_tpu.engines import gatys
    from styletransfer_tpu.models import vgg
    from styletransfer_tpu.utils import images

    content_image_path = os.path.join(constants.PROJECT_ROOT_PATH, content_image_path)

    imsize = size or constants.IMSIZE
    # STYLE-IMAGE-PATH may be a blend spec `a.png,b.png[:0.3,0.7]`
    # (weighted-average Gram targets — same syntax as the daemon's STYLE
    # field, docs/serving.md). A plain path parses to a 1-element blend.
    try:
        style_paths, style_ws = gatys.parse_style_spec(
            style_image_path, root=constants.PROJECT_ROOT_PATH
        )
    except ValueError as exc:
        raise click.UsageError(str(exc))
    style_paths = [
        os.path.join(constants.PROJECT_ROOT_PATH, p) for p in style_paths
    ]

    from styletransfer_tpu.engines.fast import IMAGE_EXTS

    if os.path.isdir(content_image_path):
        names = sorted(
            n for n in os.listdir(content_image_path)
            if n.lower().endswith(IMAGE_EXTS)
        )
        if batch:
            names = names[:batch]
        if not names:
            raise click.ClickException(
                f"No images found in directory {content_image_path}"
            )
        content_image = jnp.asarray(np.concatenate([
            images.load_image(os.path.join(content_image_path, n), size=imsize)
            for n in names
        ]))
    else:
        names = [None]
        content_image = jnp.asarray(images.load_image(content_image_path, size=imsize))

    vgg_params = vgg.load_params()

    # In blend mode train_gatys takes precomputed style_grams and ignores
    # style_image, so the first style is decoded exactly once either way.
    style_image = None
    style_grams = None
    if len(style_paths) > 1:
        style_grams = gatys.blend_grams(
            [vgg.style_gram_targets(
                vgg_params, jnp.asarray(images.load_image(p, size=imsize)))
             for p in style_paths],
            style_ws,
        )
    else:
        style_image = jnp.asarray(images.load_image(style_paths[0], size=imsize))

    converted, _losses = gatys.train_gatys(
        vgg_params,
        style_image=style_image,
        style_grams=style_grams,
        content_image=content_image,
        steps=steps,
        style_weight=style_weight,
        content_weight=content_weight,
        optimizer=optimizer,
        learning_rate=learning_rate,
        history_size=history_size,
        history_math=history_math,
        coarse_steps=coarse_steps,
        coarse_scale=coarse_scale,
        precision=precision,
    )

    out_dir = os.path.join(constants.PROJECT_ROOT_PATH, "results")
    os.makedirs(out_dir, exist_ok=True)
    stem, ext = os.path.splitext(out_name)
    used: dict = {}
    for i, name in enumerate(names):
        suffix = f"_{os.path.splitext(name)[0]}" if name is not None else ""
        # a.png and a.jpg share a stem: disambiguate instead of silently
        # overwriting one finished optimization with the other.
        n_seen = used.get(suffix, 0)
        used[suffix] = n_seen + 1
        if n_seen:
            suffix = f"{suffix}_{n_seen + 1}"
        out_file = os.path.join(out_dir, f"{stem}{suffix}{ext}")
        images.save_image(converted[i : i + 1], out_file)
        LOGGER.info("Done! Transformed image has been saved to: %s", out_file)
