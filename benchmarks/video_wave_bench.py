"""Where a 64-stream video-serve wave actually spends its time.

The streaming daemon (engines/video.py serve_stream_loop) keeps one
[1, H, W, 3] device array per stream and assembles each wave's ``olds``
with a device-side ``jnp.concatenate`` over the wave's lanes, then
scatters the step output back as per-lane ``out_model[k:k+1]`` slices.
On a tunneled backend every one of those little ops is a dispatch; at 64
lanes that's ~128 dispatches per wave on top of the ONE real device call.

This bench A/Bs the carry layout at serving shapes, with the daemon's
own step function:

- A (shipped): per-lane [1,...] carries, concat to assemble, slice to
  scatter — exactly the daemon's device-op pattern;
- B (slot table): ONE [S, H, W, 3] resident buffer, assemble with
  ``jnp.take(buffer, idx)``, scatter with ``buffer.at[idx].set(out)``
  — two ops per wave regardless of lane count.

Both run W warm waves back-to-back (outputs read back as uint8, like
the daemon); reported is s/wave. A phase-split run forces completion
after each stage of pattern A to attribute its time.

Run: python benchmarks/video_wave_bench.py
Env: WAVEB_LANES (64), WAVEB_SIZE (256), WAVEB_WAVES (10)
"""

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np

import styletransfer_tpu  # noqa: F401 - cache/platform side effects
import jax
import jax.numpy as jnp

from styletransfer_tpu.models import transformer
from styletransfer_tpu.utils import images as img_utils

LANES = int(os.environ.get("WAVEB_LANES", "64"))
SIZE = int(os.environ.get("WAVEB_SIZE", "256"))
WAVES = int(os.environ.get("WAVEB_WAVES", "10"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    params = transformer.init_params(jax.random.PRNGKey(0), in_channels=6)

    @jax.jit
    def step(params, frame_u8, old):
        f = img_utils.maybe_normalize_on_device(frame_u8)
        out = transformer.apply(params, jnp.concatenate([f, old], axis=-1))
        return out, img_utils.to_uint8_on_device(out)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(LANES, SIZE, SIZE, 3), dtype=np.uint8)

    # warm the program + allocate initial carries
    zero_old = jnp.zeros((LANES, SIZE, SIZE, 3), jnp.float32)
    out_model, out_u8 = step(params, jnp.asarray(frames), zero_old)
    float(jnp.sum(out_u8))

    results = {"lanes": LANES, "size": SIZE, "waves": WAVES}

    # --- A: per-lane carries (shipped daemon pattern) ---
    carries = [out_model[k:k + 1] for k in range(LANES)]
    t0 = time.perf_counter()
    for _ in range(WAVES):
        placed = jnp.asarray(frames)
        olds = jnp.concatenate(carries)
        out_model, out_u8 = step(params, placed, olds)
        np.asarray(out_u8)  # uint8 readback, like the daemon
        carries = [out_model[k:k + 1] for k in range(LANES)]
    float(jnp.sum(jnp.concatenate(carries)))
    results["per_lane_s_per_wave"] = round(
        (time.perf_counter() - t0) / WAVES, 4)
    log(f"A per-lane carries: {results['per_lane_s_per_wave']} s/wave")

    # phase split for A (forces completion after each phase; the forced
    # run is slower in total — it exists to attribute, not to compare)
    phases = {"place": 0.0, "concat": 0.0, "step+readback": 0.0,
              "slice": 0.0}
    for _ in range(WAVES):
        t = time.perf_counter()
        placed = jnp.asarray(frames)
        float(jnp.sum(placed))
        phases["place"] += time.perf_counter() - t
        t = time.perf_counter()
        olds = jnp.concatenate(carries)
        float(jnp.sum(olds))
        phases["concat"] += time.perf_counter() - t
        t = time.perf_counter()
        out_model, out_u8 = step(params, placed, olds)
        np.asarray(out_u8)
        phases["step+readback"] += time.perf_counter() - t
        t = time.perf_counter()
        carries = [out_model[k:k + 1] for k in range(LANES)]
        float(sum(jnp.sum(c) for c in carries))
        phases["slice"] += time.perf_counter() - t
    results["phase_split_s"] = {k: round(v / WAVES, 4)
                                for k, v in phases.items()}
    log(f"A phase split (s/wave, forced): {results['phase_split_s']}")

    # --- B: slot-table carry buffer ---
    buffer = jnp.zeros((LANES, SIZE, SIZE, 3), jnp.float32)
    idx = jnp.arange(LANES)
    out_model, out_u8 = step(params, jnp.asarray(frames),
                             jnp.take(buffer, idx, axis=0))
    buffer = buffer.at[idx].set(out_model)
    float(jnp.sum(buffer))
    t0 = time.perf_counter()
    for _ in range(WAVES):
        placed = jnp.asarray(frames)
        olds = jnp.take(buffer, idx, axis=0)
        out_model, out_u8 = step(params, placed, olds)
        np.asarray(out_u8)
        buffer = buffer.at[idx].set(out_model)
    float(jnp.sum(buffer))
    results["slot_table_s_per_wave"] = round(
        (time.perf_counter() - t0) / WAVES, 4)
    log(f"B slot table: {results['slot_table_s_per_wave']} s/wave")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
