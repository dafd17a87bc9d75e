"""Coarse-to-fine Gatys: quality-vs-time curve for the --coarse-steps knob.

Measures whether spending early optimization at half resolution buys the
same final loss in less wall time under the shipped torch-contract L-BFGS
(`train_gatys(coarse_steps=...)`, engines/gatys.py).

Method — two compiled programs only (tunnel compiles are the scarce
resource, see ROADMAP.md):

1. ``P_fine``: the full-res contract program with an EXPLICIT init arg.
   Baseline = ``P_fine(init=content)`` (bit-identical to the cold path —
   init is data). Warm = ``P_fine(init=upsampled coarse result)``. One
   compile serves both.
2. ``P_coarse``: the half-res program for the coarse stage.

The contract program is a masked ``lax.scan`` (tolerance breaks fold into
a carried mask, ops/lbfgs.py), so per-step wall time is CONSTANT — the
returned per-step loss history plus one timed run convert exactly to a
time-to-loss curve without compiling one program per step count:
for each baseline milestone loss (step s), find the first warm step s'
reaching it; warm time = T_coarse + s' * (T_fine / FINE_STEPS).

Run: python benchmarks/gatys_coarse_bench.py
Env: COARSE_FINE_STEPS (default 300), COARSE_STEPS (default 100),
COARSE_SCALE (default 0.5), COARSE_SIZE (default 256; CPU smoke: 64).
"""

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from styletransfer_tpu.engines import gatys
from styletransfer_tpu.models import vgg
from styletransfer_tpu.utils import demo, images

FINE_STEPS = int(os.environ.get("COARSE_FINE_STEPS", "300"))
COARSE_STEPS = int(os.environ.get("COARSE_STEPS", "100"))
SCALE = float(os.environ.get("COARSE_SCALE", "0.5"))
SIZE = int(os.environ.get("COARSE_SIZE", "256"))


def _force(x) -> float:
    return float(jnp.sum(x))  # axon ignores block_until_ready


def main():
    assets = demo.ensure_demo_assets()
    vgg_params = vgg.load_params()
    style = jnp.asarray(images.load_image(assets["style"], size=SIZE))
    content = jnp.asarray(images.load_image(assets["content"], size=SIZE))
    grams = jax.jit(vgg.style_gram_targets)(vgg_params, style)

    def fine(init):
        return gatys._run_lbfgs_torch(
            vgg_params, content, grams, FINE_STEPS, 1e5, 1.0,
            init_pixels=init)

    n, h, w, c = content.shape
    ch = max(32, int(h * SCALE) // 8 * 8)
    cw = max(32, int(w * SCALE) // 8 * 8)
    small = jax.image.resize(content, (n, ch, cw, c), method="linear")

    def coarse():
        return gatys._run_lbfgs_torch(
            vgg_params, small, grams, COARSE_STEPS, 1e5, 1.0)

    # Compile both programs (also warms them for the timed runs).
    _force(fine(content)[0])
    _force(coarse()[0])

    t0 = time.time()
    _, base_losses = fine(content)
    _force(base_losses)
    t_fine = time.time() - t0
    s_per_step = t_fine / FINE_STEPS

    t0 = time.time()
    coarse_px, coarse_losses = coarse()
    _force(coarse_px)
    t_coarse = time.time() - t0
    init = jax.image.resize(
        coarse_px, content.shape, method="linear").astype(content.dtype)
    _, warm_losses = fine(init)
    _force(warm_losses)

    base = np.asarray(base_losses)
    warm = np.asarray(warm_losses)
    rows = []
    for s in (50, 100, 200, FINE_STEPS - 1):
        if s >= FINE_STEPS:
            continue
        target = float(base[s])
        hit = np.nonzero(warm <= target)[0]
        t_base = (s + 1) * s_per_step
        if hit.size:
            sp = int(hit[0])
            t_warm = t_coarse + (sp + 1) * s_per_step
            rows.append({
                "milestone_step": s + 1, "loss": round(target, 4),
                "baseline_s": round(t_base, 1),
                "warm_steps": sp + 1, "warm_s": round(t_warm, 1),
                "speedup": round(t_base / t_warm, 2),
            })
        else:
            rows.append({
                "milestone_step": s + 1, "loss": round(target, 4),
                "baseline_s": round(t_base, 1), "warm_steps": None,
                "warm_s": None, "speedup": None,
            })

    out = {
        "size": SIZE, "coarse": {"steps": COARSE_STEPS, "scale": SCALE,
                                 "res": [ch, cw], "wall_s": round(t_coarse, 1),
                                 "final_loss": round(float(np.asarray(
                                     coarse_losses)[-1]), 4)},
        "fine_steps": FINE_STEPS, "s_per_fine_step": round(s_per_step, 3),
        "base_final_loss": round(float(base[-1]), 4),
        "warm_final_loss": round(float(warm[-1]), 4),
        "milestones": rows,
    }
    print(json.dumps(out, indent=2))
    print("\n| baseline step (loss) | baseline s | warm steps | warm s | speedup |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['milestone_step']} ({r['loss']}) | {r['baseline_s']} "
              f"| {r['warm_steps']} | {r['warm_s']} | {r['speedup']} |")


if __name__ == "__main__":
    main()
