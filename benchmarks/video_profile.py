"""Per-op profile of the video_st scanned train step on the local chip.

Mirror of benchmarks/train_profile.py for the recurrent video step
(`engines.video.make_scan_train_step`): captures a jax.profiler trace of a
few steady-state steps (each step = ``chunk`` sequential frame updates via
``lax.scan``) and prints the top device ops by total duration. Results are
recorded in docs/performance.md.

Run: python -m benchmarks.video_profile [chunk] [batch]
(default 16 4; BENCH_PRECISION as in train_bench).

**Known backend limitation (2026-08-17, tunneled ``axon``):** the profiler
cannot trace the full scanned step — ``jax.profiler.trace`` aborts with
``INVALID_ARGUMENT: TPU backend error`` at trace stop, poisoning the next
readback. Minimal repros of scan, donated-carry scan, and cond-inside-scan
all trace FINE, so the failure is specific to this program's size/content,
not its structure. ``--flat`` profiles the scan *body* instead (one
frame-update jitted without the scan/cond wrapper — the same fwd+bwd+Adam
work the scan runs per frame), which traces cleanly and is the per-op
breakdown that matters.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from styletransfer_tpu.engines import video
    from styletransfer_tpu.models import transformer, vgg

    args = [a for a in sys.argv[1:] if a != "--flat"]
    flat = "--flat" in sys.argv[1:]
    chunk = int(args[0]) if len(args) > 0 else 16
    batch = int(args[1]) if len(args) > 1 else 4
    precision = os.environ.get("BENCH_PRECISION", "bf16")
    cd = jnp.bfloat16 if precision == "bf16" else None
    rng = np.random.default_rng(0)

    vgg_params = vgg.init_params(jax.random.PRNGKey(0))
    style = jnp.asarray(rng.standard_normal((1, 256, 256, 3)), dtype=jnp.float32)
    grams = vgg.style_gram_targets(vgg_params, style)
    opt, step = video.make_scan_train_step(vgg_params, grams, compute_dtype=cd)

    params = transformer.init_video_params(jax.random.PRNGKey(1))
    opt_state = opt.init(params)
    mask = video.freeze_mask(params, False)
    frames = jnp.asarray(
        rng.standard_normal((chunk, batch, 256, 256, 3)), dtype=jnp.float32
    )
    valid = jnp.ones((chunk,), bool)
    old = frames[0]

    if flat:
        import optax

        @jax.jit
        def flat_step(params, opt_state, frame, old_c, old_s):
            (_, (transformed, metrics)), grads = jax.value_and_grad(
                video.frame_loss_fn, has_aux=True
            )(params, frame, old_c, old_s, vgg_params, grams,
              100_000.0, 1.0, 0.8, cd)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, transformed, metrics

        chunk = 1

        def run():
            p, s, t, m = flat_step(params, opt_state, frames[0], old, old)
            return p, s, None, None, m
    else:

        def run():
            return step(params, opt_state, frames, valid, old, old, mask)

    # Warm up (compile) out of the trace window.
    p, s, _, _, metrics = run()
    float(np.asarray(metrics["total"]).sum())

    logdir = "/tmp/stx_video_profile"
    os.system(f"rm -rf {logdir}")
    n_steps = 2
    with jax.profiler.trace(logdir):
        for _ in range(n_steps):
            p, s, _, _, metrics = run()
        float(np.asarray(metrics["total"]).sum())

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace file under {logdir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)

    pids_dev = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            if "TPU" in str(ev.get("args", {}).get("name", "")) or "device" in str(
                ev.get("args", {}).get("name", "")
            ).lower():
                pids_dev.add(ev["pid"])

    totals = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in pids_dev:
            continue
        name = ev.get("name", "?")
        totals[name] += ev.get("dur", 0.0)
        counts[name] += 1

    grand = sum(totals.values())
    per = n_steps * chunk  # report per FRAME update for comparability
    print(
        f"precision={precision} chunk={chunk} batch={batch} — device op time"
        f" per frame-update over {n_steps} steps:"
    )
    print(f"{'op':60s} {'ms/frame':>9s} {'count':>6s} {'%':>6s}")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:35]:
        print(
            f"{name[:60]:60s} {us / per / 1e3:9.3f} {counts[name]:6d}"
            f" {100 * us / grand:5.1f}%"
        )
    print(f"{'TOTAL':60s} {grand / per / 1e3:9.3f}")


if __name__ == "__main__":
    main()
