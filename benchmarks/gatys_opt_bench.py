"""Gatys optimizer comparison: Adam vs L-BFGS on TPU.

Measures per-step throughput and convergence/fidelity for the two on-device
optimizers (the reference uses torch L-BFGS over pixels, network.py:435;
Adam is the faster-per-step alternative it kept commented at
network.py:431-433). Records:

- it/s for each optimizer at 256px batch 1 (forced-completion timing — see
  docs/performance.md methodology),
- loss after the CLI-default 300 steps for each,
- the output delta between the two results (mean |Δ| in 8-bit pixel units
  after denormalization).

Run: python benchmarks/gatys_opt_bench.py
"""

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax.numpy as jnp
import numpy as np

from styletransfer_tpu.engines import gatys
from styletransfer_tpu.models import vgg
from styletransfer_tpu.utils import demo, images

STEPS_TIMED = 100
STEPS_FIDELITY = 300  # the CLI default


def _run(opt: str, vgg_params, style, content, steps: int):
    out, losses = gatys.train_gatys(
        vgg_params, style, content, steps=steps, optimizer=opt, log_every=None
    )
    # Force completion (block_until_ready does not sync on axon).
    _ = float(jnp.sum(out))
    return out, losses


def main():
    assets = demo.ensure_demo_assets()
    vgg_params = vgg.load_params()
    style = jnp.asarray(images.load_image(assets["style"]))
    content = jnp.asarray(images.load_image(assets["content"]))

    print("warming up / compiling both optimizers ...", file=sys.stderr)
    for opt in ("adam", "lbfgs"):
        _run(opt, vgg_params, style, content, STEPS_TIMED)

    results = {}
    for opt in ("adam", "lbfgs"):
        t0 = time.time()
        _, losses = _run(opt, vgg_params, style, content, STEPS_TIMED)
        dt = time.time() - t0
        results[opt] = {"it_per_s": STEPS_TIMED / dt, "loss_100": float(losses[-1])}
        print(f"{opt}: {STEPS_TIMED / dt:.1f} it/s, loss@100={losses[-1]:.4f}",
              file=sys.stderr)

    out_a, loss_a = _run("adam", vgg_params, style, content, STEPS_FIDELITY)
    out_l, loss_l = _run("lbfgs", vgg_params, style, content, STEPS_FIDELITY)
    px_a = images.to_uint8(np.asarray(out_a)).astype(np.float32)
    px_l = images.to_uint8(np.asarray(out_l)).astype(np.float32)
    delta = float(np.mean(np.abs(px_a - px_l)))
    print(
        f"fidelity @ {STEPS_FIDELITY} steps: adam loss {float(loss_a[-1]):.4f}, "
        f"lbfgs loss {float(loss_l[-1]):.4f}, mean |Δpixel| = {delta:.2f}/255",
        file=sys.stderr,
    )
    import json

    print(json.dumps({
        "adam_it_per_s": round(results["adam"]["it_per_s"], 1),
        "lbfgs_it_per_s": round(results["lbfgs"]["it_per_s"], 1),
        "adam_loss_300": round(float(loss_a[-1]), 4),
        "lbfgs_loss_300": round(float(loss_l[-1]), 4),
        "mean_abs_pixel_delta_8bit": round(delta, 2),
    }))


if __name__ == "__main__":
    main()
