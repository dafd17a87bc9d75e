"""Gatys optimizer comparison: torch-contract L-BFGS vs optax zoom vs Adam.

The reference runs torch L-BFGS over pixels (network.py:435) with
max_iter=20 inner iterations per CLI step; our default ``lbfgs``
(ops/lbfgs.py) replicates that exactly, so at the CLI default 300 steps it
performs ~6000 closure evaluations. ``lbfgs-zoom`` (optax, zoom linesearch)
and ``adam`` do one update per step. This bench records, at 256px batch 1:

- throughput for each optimizer (forced-completion timing — see
  docs/performance.md methodology), in steps/s AND closure-evals/s,
- loss after the CLI-default 300 steps for each,
- output deltas vs the torch-contract result (mean |Δ| in 8-bit pixel
  units) — how far the cheaper optimizers land from reference behavior.

Run: python benchmarks/gatys_opt_bench.py
"""

import json
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

STEPS = 300  # the CLI default
EVALS_PER_STEP = {"adam": 1, "lbfgs-zoom": 1, "lbfgs": 20}


def _run(opt: str, vgg_params, style, content, steps: int):
    out, losses = gatys.train_gatys(
        vgg_params, style, content, steps=steps, optimizer=opt, log_every=None
    )
    _ = float(jnp.sum(out))  # force completion (axon: no block_until_ready)
    return out, losses


def main():
    assets = demo.ensure_demo_assets()
    vgg_params = vgg.load_params()
    style = jnp.asarray(images.load_image(assets["style"]))
    content = jnp.asarray(images.load_image(assets["content"]))

    results = {}
    outs = {}
    for opt in ("adam", "lbfgs-zoom", "lbfgs"):
        _run(opt, vgg_params, style, content, STEPS)  # compile + warm
        t0 = time.time()
        out, losses = _run(opt, vgg_params, style, content, STEPS)
        dt = time.time() - t0
        outs[opt] = images.to_uint8(np.asarray(out)).astype(np.float32)
        results[opt] = {
            "steps_per_s": STEPS / dt,
            "evals_per_s": STEPS * EVALS_PER_STEP[opt] / dt,
            "loss_300": float(losses[-1]),
        }
        print(
            f"{opt}: {STEPS / dt:.1f} steps/s "
            f"({STEPS * EVALS_PER_STEP[opt] / dt:.1f} evals/s), "
            f"loss@{STEPS}={losses[-1]:.4f}",
            file=sys.stderr,
        )

    for opt in ("adam", "lbfgs-zoom"):
        delta = float(np.mean(np.abs(outs[opt] - outs["lbfgs"])))
        results[opt]["mean_abs_pixel_delta_vs_lbfgs_8bit"] = round(delta, 2)
        print(f"{opt} vs torch-contract lbfgs: mean |Δpixel| = {delta:.2f}/255",
              file=sys.stderr)

    print(json.dumps({k: {kk: round(vv, 4) for kk, vv in v.items()}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
