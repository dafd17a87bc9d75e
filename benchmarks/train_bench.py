"""Training-step throughput benchmark (fast_st and video_st).

Measures steady-state jitted train-step throughput on the default backend
with forced-completion timing (scalar readback per timed region — see
docs/performance.md). Prints one JSON dict.

Usage: ``python benchmarks/train_bench.py [batch ...]`` (default: 4 64).
Set ``BENCH_PRECISION=bf16`` for mixed-precision steps.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from styletransfer_tpu.engines import fast, video
    from styletransfer_tpu.models import transformer, vgg

    batches = [int(b) for b in sys.argv[1:]] or [4, 64]
    rng = np.random.default_rng(0)
    vgg_params = vgg.init_params(jax.random.PRNGKey(0))
    style = jnp.asarray(rng.standard_normal((1, 256, 256, 3)), dtype=jnp.float32)
    grams = vgg.style_gram_targets(vgg_params, style)

    precision = os.environ.get("BENCH_PRECISION", "f32")
    cd = jnp.bfloat16 if precision == "bf16" else None
    out = {"precision": precision}
    opt, step = fast.make_train_step(vgg_params, grams, compute_dtype=cd)
    for bs in batches:
        # Fresh (non-donated) params per config — the step donates its inputs.
        p = transformer.init_params(jax.random.PRNGKey(1))
        s = opt.init(p)
        x = jnp.asarray(rng.standard_normal((bs, 256, 256, 3)), dtype=jnp.float32)
        p, s, m = step(p, s, x)
        float(m["total"])  # compile + force
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            p, s, m = step(p, s, x)
        float(m["total"])
        dt = time.perf_counter() - t0
        out[f"fast_train_imgs_per_sec_b{bs}"] = round(n * bs / dt, 1)
        print(f"fast train b{bs}: {n * bs / dt:.0f} img/s ({dt / n * 1e3:.1f} ms/step)",
              file=sys.stderr, flush=True)

    # Video: scanned chunk of 16 frames, batch 4.
    vopt, vstep = video.make_scan_train_step(vgg_params, grams, compute_dtype=cd)
    vp = transformer.init_video_params(jax.random.PRNGKey(2))
    vs = vopt.init(vp)
    mask = video.freeze_mask(vp, False)
    frames = jnp.asarray(
        rng.standard_normal((16, 4, 256, 256, 3)), dtype=jnp.float32
    )
    old = frames[0]
    valid = jnp.ones(frames.shape[0], dtype=bool)
    vp, vs, oc, os_, m = vstep(vp, vs, frames, valid, old, old, mask)
    float(m["total"][-1])
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        vp, vs, oc, os_, m = vstep(vp, vs, frames, valid, oc, os_, mask)
    float(m["total"][-1])
    dt = time.perf_counter() - t0
    fps = n * frames.shape[0] * frames.shape[1] / dt
    out["video_train_frame_updates_per_sec_b4"] = round(fps, 1)
    print(f"video train: {fps:.0f} frame-updates/s", file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
