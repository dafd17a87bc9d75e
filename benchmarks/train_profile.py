"""Per-op profile of the fast_st train step on the local chip.

Captures a jax.profiler trace of a few steady-state train steps and prints
the top device ops by total duration (aggregated over identical op names),
plus the step's XLA FLOP/byte cost analysis. Used to find the next hot op —
results are recorded in docs/performance.md.

Run: python -m benchmarks.train_profile [batch] (default 128; bf16 set via
BENCH_PRECISION as in train_bench).
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
    from styletransfer_tpu.engines import fast
    from styletransfer_tpu.models import transformer, vgg

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    precision = os.environ.get("BENCH_PRECISION", "bf16")
    cd = jnp.bfloat16 if precision == "bf16" else None
    rng = np.random.default_rng(0)

    vgg_params = vgg.init_params(jax.random.PRNGKey(0))
    style = jnp.asarray(rng.standard_normal((1, 256, 256, 3)), dtype=jnp.float32)
    grams = vgg.style_gram_targets(vgg_params, style)
    opt, step = fast.make_train_step(vgg_params, grams, compute_dtype=cd)

    params = transformer.init_params(jax.random.PRNGKey(1))
    opt_state = opt.init(params)
    x = jnp.asarray(
        rng.standard_normal((batch, 256, 256, 3)), dtype=jnp.float32
    )

    # Warm up (compile) out of the trace window.
    params, opt_state, metrics = step(params, opt_state, x)
    float(metrics["total"])

    logdir = "/tmp/stx_train_profile"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            params, opt_state, metrics = step(params, opt_state, x)
        float(metrics["total"])

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace file under {logdir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)

    # Keep device-lane complete events only (TPU op lanes have pid/tid with
    # names like "/device:TPU:0" in the process metadata).
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
    print(f"precision={precision} batch={batch} — device op time over 3 steps:")
    print(f"{'op':60s} {'ms/step':>9s} {'count':>6s} {'%':>6s}")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:35]:
        print(
            f"{name[:60]:60s} {us / 3e3:9.3f} {counts[name] // 3:6d}"
            f" {100 * us / grand:5.1f}%"
        )
    print(f"{'TOTAL':60s} {grand / 3e3:9.3f}")


if __name__ == "__main__":
    main()
