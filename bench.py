"""Benchmark driver: fast_st stylization throughput on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: stylized 256px images/sec/chip through the flagship
ImageTransformNet (the BASELINE.json north-star asks for >= 1000 img/s/chip;
``vs_baseline`` is measured/1000). Additional diagnostics (Gatys iters/sec,
video frames/sec) go to stderr so stdout stays a single JSON line.

Timing methodology: on the axon-tunneled TPU backend ``block_until_ready``
does not synchronize, so each timed region chains iterations (output feeds
the next input where possible) and ends with a scalar host readback that
forces completion of the whole chain.

Run: ``python bench.py``. Env knobs: BENCH_BATCH (default 128), BENCH_ITERS
(default 20), BENCH_TRIALS (default 5; headline is best-of-trials — the
tunneled backend swings 2x run-to-run under contention),
BENCH_SKIP_EXTRAS=1 for headline only, BENCH_DISPATCH_WATCHDOG_S (default
120) / BENCH_DISPATCH_RETRIES (default 2) for the first-dispatch stall
watchdog (stall diagnostics also land in
``benchmarks/results/bench_compile_sidecar.json``).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _probe_backend(timeout_s: int = 150) -> None:
    """Probe the accelerator backend; retry through transient outages,
    then fail FAST rather than blocking ~30 minutes in backend init.

    The tunneled backend has had multi-hour outages (2026-08-17/18) but
    also brief blips; a single-shot probe turned a blip into a missed
    round artifact (BENCH_r03 rc=3). So: probe in a short-lived
    subprocess, and on failure retry with doubling backoff
    (BENCH_PROBE_RETRIES attempts, default 4 ≈ 13 min of patience
    total), exiting 3 only when the backend stays unreachable. Skip
    everything with BENCH_SKIP_PROBE=1.
    """
    if os.environ.get("BENCH_SKIP_PROBE") == "1":
        return
    import subprocess

    attempts = int(os.environ.get("BENCH_PROBE_RETRIES", "4"))
    backoff_s = 60.0
    last = ""
    for attempt in range(1, attempts + 1):
        try:
            r = subprocess.run(
                # Import the package first so STX_PLATFORM et al. apply —
                # the probe must exercise the same backend selection as the
                # bench. cwd = this script's dir: the child must find the
                # package the same way the parent does (script-dir sys.path
                # entry), so a not-pip-installed run from elsewhere doesn't
                # masquerade as a backend outage.
                [sys.executable, "-c",
                 "import styletransfer_tpu, jax; jax.devices()"],
                capture_output=True, text=True, timeout=timeout_s,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if r.returncode == 0:
                if attempt > 1:
                    log(f"backend probe recovered on attempt {attempt}")
                return
            last = "probe failed:\n" + (r.stderr or r.stdout)[-2000:]
        except subprocess.TimeoutExpired:
            last = (f"probe timed out after {timeout_s}s — backend "
                    "unreachable (tunnel outage?)")
        if attempt < attempts:
            log(f"backend {last}")
            log(f"retrying in {backoff_s:.0f}s "
                f"(attempt {attempt}/{attempts})")
            time.sleep(backoff_s)
            backoff_s *= 2
    log(f"backend {last}")
    log(f"backend unreachable after {attempts} probe attempts; aborting "
        "bench fast instead of blocking in backend init")
    sys.exit(3)


def _watchdogged_first_dispatch(run, watchdog_s: float, attempts: int):
    """Execute ``run()`` (dispatch + forced readback) under a stall watchdog.

    The round-4 official bench artifact recorded a 1378.5 s "first dispatch"
    while the compile cache was hot — a tunnel stall, not a cold cache — and
    nothing in the artifact could distinguish the two.  This wrapper runs the
    first dispatch in a worker thread; if it exceeds ``watchdog_s`` the
    attempt is recorded as *stalled* (waited out to a hard bound so we never
    pile concurrent dispatches on a wedged backend) and the dispatch is
    retried.  Returns ``(first_dispatch_s, retries, stalled_s)`` where
    ``first_dispatch_s`` is the first non-stalled attempt's wall time (or the
    final attempt's, if every attempt stalled — honest worst case).
    """
    import threading

    stalled_total = 0.0
    retries = 0
    dt = float("inf")
    for attempt in range(1, attempts + 1):
        box: dict = {}

        def work() -> None:
            t0 = time.perf_counter()
            run()
            box["dt"] = time.perf_counter() - t0

        t_start = time.perf_counter()
        th = threading.Thread(target=work, daemon=True)
        th.start()
        th.join(watchdog_s)
        if "dt" in box:
            return box["dt"], retries, stalled_total
        log(
            f"first dispatch exceeded the {watchdog_s:.0f}s watchdog "
            f"(attempt {attempt}/{attempts}) — tunnel stall suspected; "
            "waiting it out before re-dispatching"
        )
        # Hard bound: don't wait forever for a wedged backend, but long
        # enough that a merely-slow window completes before we re-dispatch.
        th.join(float(os.environ.get("BENCH_DISPATCH_HARD_WAIT_S", "600")))
        waited = time.perf_counter() - t_start
        if "dt" not in box:
            # The dispatch NEVER completed within the hard bound. Do not
            # re-dispatch — a second in-flight call on a wedged backend
            # would contend with (and corrupt the timing of) this one.
            # Report the wait as the dispatch time and as stalled; the
            # sidecar's first_dispatch_s >> watchdog makes the give-up
            # unmistakable.
            log(f"dispatch still in flight after {waited:.1f}s; giving up "
                "without re-dispatching (backend wedged)")
            return waited, retries, stalled_total + waited
        dt = box["dt"]
        if attempt == attempts:
            # Out of retries: the final attempt's own (stalled) duration
            # IS the reported dispatch time — not counted again as
            # stalled_s, which tallies only the time wasted on attempts
            # that were superseded by a retry.
            return dt, retries, stalled_total
        stalled_total += waited
        retries += 1
        log(f"stalled attempt took {waited:.1f}s; re-dispatching")
    return dt, retries, stalled_total


def main() -> None:
    _probe_backend()

    from styletransfer_tpu.engines import gatys, video
    from styletransfer_tpu.models import transformer, vgg

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    size = 256

    log(f"devices: {jax.devices()}  batch={batch}  size={size}  iters={iters}")

    # --- Headline: fast_st inference throughput (img/s/chip at 256px) ---
    params = transformer.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, size, size, 3)),
        dtype=jnp.float32,
    )
    apply_jit = jax.jit(transformer.apply)

    # Split the startup cost so the artifact attributes it correctly:
    # with a warm persistent cache, XLA compile is ~0.2 s (cache hit) and
    # the remainder is the tunneled backend preparing the program
    # server-side on FIRST dispatch (measured 15-220 s depending on
    # contention — backend-inherent, not a cold cache; see
    # docs/performance.md "Compile cost").
    t0 = time.perf_counter()
    lowered = apply_jit.lower(params, x)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    def _first():
        float(jnp.sum(compiled(params, x)))  # force execute

    t_first, n_retries, t_stalled = _watchdogged_first_dispatch(
        _first,
        watchdog_s=float(os.environ.get("BENCH_DISPATCH_WATCHDOG_S", "120")),
        attempts=1 + int(os.environ.get("BENCH_DISPATCH_RETRIES", "2")),
    )
    log(f"fast_st compile+first: {t_lower + t_compile + t_first:.1f}s "
        f"(trace+lower {t_lower:.1f}s, xla compile {t_compile:.1f}s, "
        f"first dispatch {t_first:.1f}s, retries {n_retries}, "
        f"stalled {t_stalled:.1f}s)")
    # Sidecar JSON so the driver-visible record can't conflate a tunnel
    # stall with a cold cache (stdout stays the one-line contract).
    try:
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "benchmarks", "results", "bench_compile_sidecar.json",
        )
        with open(sidecar, "w") as f:
            json.dump(
                {
                    "trace_lower_s": round(t_lower, 2),
                    "xla_compile_s": round(t_compile, 2),
                    "first_dispatch_s": round(t_first, 2),
                    "first_dispatch_retries": n_retries,
                    "stalled_s": round(t_stalled, 2),
                    "cache_cold": t_compile > 5.0,
                    "wall_clock_utc": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                    ),
                },
                f,
                indent=1,
            )
            f.write("\n")
    except OSError as e:  # read-only checkout must not kill the bench
        log(f"sidecar write skipped: {e}")

    best = 0.0
    for _trial in range(int(os.environ.get("BENCH_TRIALS", "5"))):
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = apply_jit(params, y)  # chained: serializes execution
        float(jnp.sum(y))  # host readback forces completion
        dt = time.perf_counter() - t0
        best = max(best, batch * iters / dt)
    imgs_per_sec = best
    log(f"fast_st inference: {imgs_per_sec:.1f} img/s")

    if os.environ.get("BENCH_SKIP_EXTRAS") != "1":
        # --- bf16 activation variant (diagnostic; headline stays f32 for
        # strict pixel parity with the reference) ---
        import functools

        apply_bf16 = jax.jit(
            functools.partial(transformer.apply, compute_dtype=jnp.bfloat16)
        )
        y = apply_bf16(params, x)
        float(jnp.sum(y))
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = apply_bf16(params, y)
        float(jnp.sum(y))
        log(f"fast_st bf16: {batch * iters / (time.perf_counter() - t0):.1f} img/s")

        # --- Gatys iters/sec at 256px: both the driver-config Adam
        # diagnostic (100 iters) and the shipped DEFAULT optimizer
        # (torch-contract L-BFGS: each step = up to 20 inner iterations,
        # matching the reference's optimizer.step(closure) semantics) ---
        vgg_params = vgg.init_params(jax.random.PRNGKey(0))
        content, style = x[:1], x[1:2]
        grams = vgg.style_gram_targets(vgg_params, style)
        steps = 100

        out, _ = gatys._run_adam(vgg_params, content, grams, steps, 1e5, 1.0, 0.05)
        float(jnp.sum(out))  # compile
        t0 = time.perf_counter()
        out, _ = gatys._run_adam(vgg_params, content, grams, steps, 1e5, 1.0, 0.05)
        float(jnp.sum(out))
        dt = time.perf_counter() - t0
        log(f"gatys (adam diagnostic): {steps / dt:.1f} iters/s")

        lsteps = 5  # 5 torch-contract steps = up to 100 closure evals
        out, _ = gatys._run_lbfgs_torch(
            vgg_params, content, grams, lsteps, 1e5, 1.0
        )
        float(jnp.sum(out))  # compile
        t0 = time.perf_counter()
        out, _ = gatys._run_lbfgs_torch(
            vgg_params, content, grams, lsteps, 1e5, 1.0
        )
        float(jnp.sum(out))
        dt = time.perf_counter() - t0
        log(
            f"gatys (default lbfgs, torch contract): "
            f"{lsteps / dt:.1f} steps/s = {lsteps * 20 / dt:.1f} closure evals/s"
        )

        # --- video frames/sec (recurrent scan, batch 1) ---
        vparams = transformer.init_video_params(jax.random.PRNGKey(1))
        frames = jnp.asarray(
            np.random.default_rng(1).standard_normal((48, 1, size, size, 3)),
            dtype=jnp.float32,
        )
        outs = video._stylize_chunk(vparams, frames, frames[0])
        float(jnp.sum(outs))  # compile
        t0 = time.perf_counter()
        outs = video._stylize_chunk(vparams, frames, frames[0])
        float(jnp.sum(outs))
        dt = time.perf_counter() - t0
        log(f"video: {frames.shape[0] / dt:.1f} frames/s")

    baseline_target = 1000.0  # BASELINE.json north star: 1k img/s/chip
    print(
        json.dumps(
            {
                "metric": "fast_st_images_per_sec_256px",
                "value": round(imgs_per_sec, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / baseline_target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
