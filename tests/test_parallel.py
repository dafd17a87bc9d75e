"""Data-parallel correctness: the mesh-sharded train step must compute the
same updates as the single-device step (XLA's inserted gradient reduction is
exact up to float reassociation)."""

import jax
import jax.numpy as jnp
import numpy as np

from styletransfer_tpu.engines import fast
from styletransfer_tpu.models import transformer, vgg
from styletransfer_tpu.parallel import mesh as mesh_lib

SIZE = 16


def _setup():
    vgg_params = vgg.init_params(jax.random.PRNGKey(0))
    style = jax.random.normal(jax.random.PRNGKey(1), (1, SIZE, SIZE, 3)) * 0.5
    grams = vgg.style_gram_targets(vgg_params, style)
    params = transformer.init_params(jax.random.PRNGKey(2))
    batch = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (8, SIZE, SIZE, 3)) * 0.5,
        dtype=np.float32,
    )
    return vgg_params, grams, params, batch


def test_dp_loss_and_grads_match_single_device():
    """The sharded loss and gradients equal the single-device ones up to
    float reassociation in the batch reduction. (Post-Adam params are NOT
    compared: the first Adam update is ~sign(grad)*lr, which amplifies
    reassociation noise unboundedly.)"""
    vgg_params, grams, params, batch = _setup()

    def loss_fn(p, b):
        total, _ = fast.loss_fn(p, b, vgg_params, grams, 1000.0, 1.0)
        return total

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    mesh1 = mesh_lib.get_mesh(num_devices=1)
    l1, g1 = grad_fn(
        mesh_lib.replicate(params, mesh1), mesh_lib.shard_batch(batch, mesh1)
    )

    mesh8 = mesh_lib.get_mesh(num_devices=8)
    l8, g8 = grad_fn(
        mesh_lib.replicate(params, mesh8), mesh_lib.shard_batch(batch, mesh8)
    )

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    # Individual leaves with near-cancelling sums (e.g. bias grads reduced
    # over batch*H*W) amplify reassociation noise; the meaningful invariant
    # is the full gradient vector.
    v1 = np.concatenate([np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(g1)])
    v8 = np.concatenate([np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(g8)])
    np.testing.assert_allclose(
        np.linalg.norm(v1), np.linalg.norm(v8), rtol=1e-4
    )
    cosine = float(v1 @ v8 / (np.linalg.norm(v1) * np.linalg.norm(v8)))
    assert cosine > 0.99999, cosine


def test_auto_mesh_divisibility():
    assert mesh_lib.auto_mesh(8).size == 8
    assert mesh_lib.auto_mesh(4).size == 4
    assert mesh_lib.auto_mesh(6).size == 6  # 6 divides by 6 devices
    assert mesh_lib.auto_mesh(7).size == 7
    assert mesh_lib.auto_mesh(5).size == 5
    assert mesh_lib.auto_mesh(3).size == 3
    assert mesh_lib.auto_mesh(1).size == 1


def test_shard_frames_axis1():
    mesh = mesh_lib.get_mesh(num_devices=4)
    chunk = np.zeros((3, 4, 8, 8, 3), np.float32)
    dev = mesh_lib.shard_frames(chunk, mesh)
    # Batch axis (1) sharded, time axis (0) replicated.
    spec = dev.sharding.spec
    assert spec[0] is None and spec[1] == "data"


def test_dp_step_overhead_is_bounded():
    """Sharding-overhead guard (the only multi-chip *performance* signal
    available without hardware): at a fixed global batch on the virtual
    8-device CPU mesh, the 8-way-sharded train step must not be slower
    than ~2x the single-device step. Every virtual device timeshares the
    same host cores, so a well-formed DP program stays ~constant (measured
    0.5x — sharding parallelizes the host cores; see
    benchmarks/dp_scaling_bench.py for the full 1/2/4/8 curve). A blowup
    here means per-device work that doesn't shrink with the shard
    (replicated gradient math, resharding copies, host round-trips)."""
    import time

    vgg_params, grams, params0, batch = _setup()
    opt, step = fast.make_train_step(vgg_params, grams, 1000.0, 1.0)
    # Host copies: the train step donates params/opt_state, and replicate()
    # onto a 1-device mesh aliases device arrays instead of copying — fresh
    # device arrays must be staged from host for each timed run.
    params_host = jax.device_get(params0)
    opt_state_host = jax.device_get(opt.init(params0))

    def timed(n_devices):
        mesh = mesh_lib.get_mesh(num_devices=n_devices)
        params = mesh_lib.replicate(params_host, mesh)
        opt_state = mesh_lib.replicate(opt_state_host, mesh)
        b = mesh_lib.shard_batch(batch, mesh)
        p, s, m = step(params, opt_state, b)  # compile + warm
        float(m["total"])
        t0 = time.perf_counter()
        for _ in range(2):
            p, s, m = step(p, s, b)
        float(m["total"])
        return (time.perf_counter() - t0) / 2

    # Wall-clock on a shared CPU host is noisy under full-suite load; the
    # guard targets the program's cost, not transient contention. Pair the
    # two timings inside each round (back-to-back, so both see the same
    # load) and take the best PAIRED ratio — min(t8)/min(t1) across
    # separated rounds has flaked when load shifted between them.
    ratios = []
    for _ in range(4):
        t1 = timed(1)
        t8 = timed(8)
        ratios.append((t8 / t1, t8, t1))
        if ratios[-1][0] < 2.5:
            break  # guard satisfied; don't burn suite time on more rounds
    best = min(ratios)
    assert best[0] < 2.5, \
        f"8-dev step {best[1]:.3f}s vs 1-dev {best[2]:.3f}s in the best " \
        f"of {len(ratios)} paired round(s)"


def test_serving_placement_serial_vs_sharded(caplog):
    """serving_placement: batch 1 is plain placement with NO auto_mesh
    idle-devices warning (a deliberately serial daemon on a multi-chip
    host is not a misconfiguration); batch 4 on the 8-device mesh shards
    the leading axis and replicates params."""
    import logging

    import numpy as np

    from styletransfer_tpu.parallel import mesh as mesh_lib

    tree = {"w": np.ones((3, 2), np.float32)}
    with caplog.at_level(logging.WARNING, logger="StyleTransfer"):
        p1, place1, _, pp1 = mesh_lib.serving_placement(1, tree)
    assert not any("auto_mesh" in r.getMessage() for r in caplog.records)
    x = place1(np.zeros((1, 4, 4, 3), np.float32))
    assert x.shape == (1, 4, 4, 3)

    p4, place4, _, pp4 = mesh_lib.serving_placement(4, tree)
    b = place4(np.zeros((4, 4, 4, 3), np.float32))
    # Sharded over 4 of the 8 virtual devices; params replicated.
    assert len(b.sharding.device_set) == 4
    assert len(pp4(tree)["w"].sharding.device_set) == 4
    assert p4["w"].sharding.is_fully_replicated


def test_resolve_global_batch_semantics():
    """--global-batch: None keeps -b as the global batch (reference
    semantics), 'auto' scales it per-chip (b x device count — every chip
    busy), an integer string overrides it, nonsense rejects."""
    import pytest

    from styletransfer_tpu.parallel import mesh as mesh_lib

    assert mesh_lib.resolve_global_batch(4, None) == 4
    assert mesh_lib.resolve_global_batch(4, "") == 4
    # 8 virtual devices in the test mesh.
    assert mesh_lib.resolve_global_batch(4, "auto") == 32
    assert mesh_lib.resolve_global_batch(2, "AUTO") == 16
    assert mesh_lib.resolve_global_batch(4, "16") == 16
    with pytest.raises(ValueError):
        mesh_lib.resolve_global_batch(4, "0")
    with pytest.raises(ValueError):
        mesh_lib.resolve_global_batch(4, "lots")
    # The auto-resolved batch fills the whole mesh: no idle devices.
    assert mesh_lib.auto_mesh(mesh_lib.resolve_global_batch(4, "auto")).devices.size == 8


def test_global_batch_auto_cli_wiring(monkeypatch, tmp_path):
    """`fast_st train --global-batch auto` hands the engine the scaled
    global batch (per-chip -b x 8 virtual devices)."""
    import numpy as np
    from click.testing import CliRunner
    from PIL import Image

    from styletransfer_tpu import constants
    from styletransfer_tpu.clis import cli
    from styletransfer_tpu.engines import fast

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))
    style = tmp_path / "style.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    ).save(style)

    seen = {}

    def fake_train(style_image, **kwargs):
        seen.update(kwargs)
        return None

    monkeypatch.setattr(fast, "static_train", fake_train)
    result = CliRunner().invoke(
        cli,
        ["fast_st", "train", "style.png", "-b", "4", "-e", "1",
         "--global-batch", "auto"],
    )
    assert result.exit_code == 0, result.output
    assert seen["batch_size"] == 32
