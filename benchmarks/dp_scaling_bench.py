"""Data-parallel step-overhead curve on the virtual CPU mesh.

Multi-chip TPU hardware is not available in this environment, so absolute
DP *speedup* cannot be measured — but gross sharding pathologies (a step
that gets slower superlinearly as devices are added, extra collectives,
resharding copies) CAN be caught for free: on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count``) every "device" timeshares the
same host cores, so a well-formed DP program should take roughly constant
wall time per step at a fixed GLOBAL batch regardless of mesh size. A
superlinear blowup indicates the program inserted per-device work that
doesn't shrink with the shard (e.g. replicated gradient math before the
psum, or host round-trips per shard).

Run: ``python benchmarks/dp_scaling_bench.py``
Prints one line per mesh size + a JSON summary; the companion regression
guard lives in tests/test_parallel.py::test_dp_step_overhead_is_bounded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from styletransfer_tpu.engines import fast  # noqa: E402
from styletransfer_tpu.models import transformer, vgg  # noqa: E402
from styletransfer_tpu.parallel import mesh as mesh_lib  # noqa: E402

GLOBAL_BATCH = 16
SIZE = 64
STEPS = 3


def time_mesh(n_devices: int) -> float:
    mesh = mesh_lib.get_mesh(num_devices=n_devices)
    vgg_params = vgg.init_params(jax.random.PRNGKey(0))
    style = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, SIZE, SIZE, 3)),
        jnp.float32,
    )
    grams = vgg.style_gram_targets(vgg_params, style)
    params = transformer.init_params(jax.random.PRNGKey(1))
    opt, step = fast.make_train_step(vgg_params, grams, 100_000.0, 1.0)

    params = mesh_lib.replicate(params, mesh)
    opt_state = mesh_lib.replicate(opt.init(params), mesh)
    batch = mesh_lib.shard_batch(
        jnp.asarray(
            np.random.default_rng(2).standard_normal(
                (GLOBAL_BATCH, SIZE, SIZE, 3)
            ),
            jnp.float32,
        ),
        mesh,
    )

    # Warm up (compile) then time STEPS chained steps.
    params, opt_state, m = step(params, opt_state, batch)
    float(m["total"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        params, opt_state, m = step(params, opt_state, batch)
    float(m["total"])
    return (time.perf_counter() - t0) / STEPS


def main() -> None:
    results = {}
    for n in (1, 2, 4, 8):
        dt = time_mesh(n)
        results[n] = dt
        print(
            f"devices={n}: {dt * 1000:.1f} ms/step "
            f"(global batch {GLOBAL_BATCH} @ {SIZE}px, virtual CPU mesh)"
        )
    overhead_8v1 = results[8] / results[1]
    print(f"8-dev / 1-dev step-time ratio: {overhead_8v1:.2f} "
          "(~1.0 = no sharding overhead; cores are shared)")
    print(json.dumps({
        "global_batch": GLOBAL_BATCH, "size": SIZE,
        "ms_per_step": {k: round(v * 1000, 1) for k, v in results.items()},
        "ratio_8v1": round(overhead_8v1, 3),
    }))


if __name__ == "__main__":
    main()
