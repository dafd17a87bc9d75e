"""Multi-host (multi-process) execution tests.

Runs TWO real OS processes on the CPU backend (2 virtual devices each, Gloo
collectives), initialized through ``parallel.distributed``, each loading a
disjoint corpus shard and contributing its slice of the global batch — then
asserts one data-parallel train step over the 2-process/4-device mesh
produces the same loss and updated params as a single-process run on the
same global batch. This is the SURVEY §2.2 comm-backend row, tested for
real (not just the single-process virtual mesh).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SIZE = 16
GLOBAL_BATCH = 4

_WORKER = r"""
import json, os, sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")

from styletransfer_tpu.parallel import distributed

idx, cnt = distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert (idx, cnt) == (pid, 2), (idx, cnt)
assert distributed.process_info() == (pid, 2)
assert jax.device_count() == 4

import numpy as np

from styletransfer_tpu.data import coco
from styletransfer_tpu.engines import fast
from styletransfer_tpu.models import transformer, vgg
from styletransfer_tpu.parallel import mesh as mesh_lib

SIZE = 16
mesh = mesh_lib.get_mesh()
assert mesh.size == 4

vgg_local = vgg.init_params(jax.random.PRNGKey(0))
import jax.numpy as jnp
style = jnp.asarray(coco.SyntheticDataset(4, SIZE).load(0))[None]
grams = vgg.style_gram_targets(vgg_local, style)

vgg_params = mesh_lib.replicate(vgg_local, mesh)
grams = mesh_lib.replicate(grams, mesh)
params = mesh_lib.replicate(transformer.init_params(jax.random.PRNGKey(1)), mesh)
opt, train_step = fast.make_train_step(vgg_params, grams)
opt_state = mesh_lib.replicate(opt.init(params), mesh)

# Each process decodes ITS corpus shard (strided split) and loads the
# local slice of the global batch.
local_bs = distributed.local_batch_size(4)
loader = coco.DataLoader(
    coco.SyntheticDataset(8, SIZE), batch_size=local_bs, shuffle=False,
    shard_index=idx, shard_count=cnt,
)
local_batch = next(iter(loader))
assert local_batch.shape == (local_bs, SIZE, SIZE, 3)
batch = mesh_lib.shard_batch(local_batch, mesh)
assert batch.shape == (4, SIZE, SIZE, 3)

params, opt_state, metrics = train_step(params, opt_state, batch)
total = float(metrics["total"])
checksum = float(
    sum(np.abs(np.asarray(leaf)).sum() for leaf in jax.tree_util.tree_leaves(
        jax.device_get(params)))
)
with open(out_path, "w") as f:
    json.dump({"total": total, "checksum": checksum, "pid": pid}, f)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    for pid in range(2):
        out = tmp_path / f"out{pid}.json"
        procs.append(
            (
                subprocess.Popen(
                    [sys.executable, str(worker), str(pid), str(port), str(out)],
                    cwd=REPO_ROOT, env=env,
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                ),
                out,
            )
        )
    results = []
    for proc, out in procs:
        # 900s: each worker compiles a full CPU train step; on the
        # 1-core CI/build box two workers race the rest of the suite
        # for the core, and 420s flaked under full-suite load.
        stdout, _ = proc.communicate(timeout=900)
        assert proc.returncode == 0, stdout.decode(errors="replace")[-4000:]
        results.append(json.loads(out.read_text()))

    # Both processes observe identical replicated results.
    assert results[0]["total"] == pytest.approx(results[1]["total"], rel=1e-6)
    assert results[0]["checksum"] == pytest.approx(results[1]["checksum"], rel=1e-6)

    # Single-process reference over the SAME global batch. The strided
    # shard split means the multi-process global batch holds rows
    # (0, 2, 1, 3) of the corpus — batch order doesn't change the mean
    # loss or the summed gradients, so results must match.
    import jax
    import jax.numpy as jnp

    from styletransfer_tpu.data import coco
    from styletransfer_tpu.engines import fast
    from styletransfer_tpu.models import transformer, vgg
    from styletransfer_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.auto_mesh(GLOBAL_BATCH)
    vgg_local = vgg.init_params(jax.random.PRNGKey(0))
    style = jnp.asarray(coco.SyntheticDataset(4, SIZE).load(0))[None]
    grams = vgg.style_gram_targets(vgg_local, style)
    vgg_params = mesh_lib.replicate(vgg_local, mesh)
    grams = mesh_lib.replicate(grams, mesh)
    params = mesh_lib.replicate(transformer.init_params(jax.random.PRNGKey(1)), mesh)
    opt, train_step = fast.make_train_step(vgg_params, grams)
    opt_state = mesh_lib.replicate(opt.init(params), mesh)

    ds = coco.SyntheticDataset(8, SIZE)
    batch = np.stack([ds.load(i) for i in (0, 2, 1, 3)])
    params, opt_state, metrics = train_step(
        params, opt_state, mesh_lib.shard_batch(batch, mesh)
    )
    ref_total = float(metrics["total"])
    ref_checksum = float(
        sum(
            np.abs(np.asarray(leaf)).sum()
            for leaf in jax.tree_util.tree_leaves(jax.device_get(params))
        )
    )
    assert results[0]["total"] == pytest.approx(ref_total, rel=1e-5)
    assert results[0]["checksum"] == pytest.approx(ref_checksum, rel=1e-5)


_CARRY_WORKER = r"""
import json, os, sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]
models_path = sys.argv[4]

import jax
jax.config.update("jax_platforms", "cpu")

from styletransfer_tpu.parallel import distributed

idx, cnt = distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np

from styletransfer_tpu import ckpt
from styletransfer_tpu.parallel import mesh as mesh_lib

mesh = mesh_lib.get_mesh()
assert mesh.size == 4

# Each process contributes 2 distinct local rows of an 4-row global carry.
local = np.arange(2 * 3 * 3 * 3, dtype=np.float32).reshape(2, 3, 3, 3)
local = local + 1000.0 * pid
global_arr = mesh_lib.shard_batch(local, mesh)
assert global_arr.shape == (4, 3, 3, 3)

ckpt.save_carry_shards(
    {"old_content": global_arr, "old_stylized": global_arr * 2.0},
    7, "video_st", "s", models_path,
)
loaded = ckpt.load_carry_shards(
    7, "video_st", "s", models_path,
    array_keys=("old_content", "old_stylized"),
)
assert loaded is not None
np.testing.assert_array_equal(loaded["old_content"], local)
np.testing.assert_array_equal(loaded["old_stylized"], local * 2.0)

# Reassembly path (what video_train's mid-batch resume does): the local
# sidecar rows shard back into a global array identical to the original.
import jax.numpy as jnp
rebuilt = mesh_lib.shard_batch(jnp.asarray(loaded["old_content"]), mesh)
total = float(jnp.sum(jnp.abs(rebuilt - global_arr)))
assert total == 0.0, total

# Stale sidecar is rejected.
assert ckpt.load_carry_shards(
    8, "video_st", "s", models_path, array_keys=("old_content",)
) is None

# Collective resume agreement: mid-batch resume requires EVERY process to
# hold a valid sidecar — a per-process fallback would put processes at
# different loop positions and deadlock the mesh. Any disagreement must
# collapse to False on ALL processes.
from styletransfer_tpu.engines import video as video_engine

assert video_engine._all_processes_agree(True) is True
assert video_engine._all_processes_agree(pid == 0) is False
assert video_engine._all_processes_agree(False) is False

with open(out_path, "w") as f:
    json.dump({"ok": True, "pid": pid}, f)
"""


def test_two_process_carry_shard_sidecars(tmp_path):
    """Multi-host exact video resume: each process saves/loads ITS local
    rows of the sharded recurrent carry via an iteration-stamped sidecar,
    and shard_batch reassembles the identical global array."""
    worker = tmp_path / "carry_worker.py"
    worker.write_text(_CARRY_WORKER)
    port = _free_port()
    models_path = tmp_path / "models"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    for pid in range(2):
        out = tmp_path / f"carry_out{pid}.json"
        procs.append(
            (
                subprocess.Popen(
                    [sys.executable, str(worker), str(pid), str(port),
                     str(out), str(models_path)],
                    cwd=REPO_ROOT, env=env,
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                ),
                out,
            )
        )
    for proc, out in procs:
        # 900s: each worker compiles a full CPU train step; on the
        # 1-core CI/build box two workers race the rest of the suite
        # for the core, and 420s flaked under full-suite load.
        stdout, _ = proc.communicate(timeout=900)
        assert proc.returncode == 0, stdout.decode(errors="replace")[-4000:]
        assert json.loads(out.read_text())["ok"]

    # One sidecar per process, topology encoded in the name.
    names = sorted(p.name for p in models_path.iterdir())
    assert [n for n in names if "step_carry" in n] == [
        "video_st_s_step_carry_p0of2.msgpack",
        "video_st_s_step_carry_p1of2.msgpack",
    ]


def test_local_batch_size_and_single_process_info():
    from styletransfer_tpu.parallel import distributed

    assert distributed.process_info() == (0, 1)
    assert distributed.local_batch_size(8) == 8
    # Single-process initialize() with no env config is a no-op.
    assert distributed.initialize() == (0, 1)


def test_video_dataset_sharding_disjoint():
    from styletransfer_tpu.data import video as video_data

    shards = [
        video_data.VideoDataset(
            videos=list(range(6)), batch_size=1, synthetic_fallback=True,
            shard_index=i, shard_count=2,
        )
        for i in range(2)
    ]
    ids = [
        tuple(v for batch in ds.video_batches for v in batch) for ds in shards
    ]
    assert ids[0] == (0, 2, 4)
    assert ids[1] == (1, 3, 5)


_LOCKSTEP_WORKER = r"""
import json, sys

pid = int(sys.argv[1]); port = sys.argv[2]; out_path = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")

from styletransfer_tpu.parallel import distributed

distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

# Deliberately UNEVEN work: pid 0 has 3 items, pid 1 has 5. Every host
# must see exactly min(3, 5) = 3 — the longer host drops its remainder
# instead of running extra (collective) steps and hanging the mesh.
items = list(range(3 if pid == 0 else 5))
seen = [x for x in distributed.lockstep(items)]

# The mesh is still aligned afterwards: a collective succeeds.
import numpy as np
from jax.experimental import multihost_utils
gathered = np.asarray(multihost_utils.process_allgather(
    np.asarray([len(seen)], dtype=np.int64)))

with open(out_path, "w") as f:
    json.dump({"seen": seen, "gathered": gathered.ravel().tolist()}, f)
"""


def test_two_process_lockstep_uneven_work(tmp_path):
    """distributed.lockstep with per-host work counts 3 vs 5: both hosts
    stop together at 3 and the mesh stays collectively aligned (the
    fix for the trainer-loop desync where uneven shards or clip lengths
    left one host blocked in a collective)."""
    worker = tmp_path / "worker.py"
    worker.write_text(_LOCKSTEP_WORKER)
    port = _free_port()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    for pid in range(2):
        out = tmp_path / f"out{pid}.json"
        procs.append((
            subprocess.Popen(
                [sys.executable, str(worker), str(pid), str(port), str(out)],
                cwd=REPO_ROOT, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            ),
            out,
        ))
    results = []
    for proc, out in procs:
        stdout, _ = proc.communicate(timeout=300)
        assert proc.returncode == 0, stdout.decode(errors="replace")[-4000:]
        results.append(json.loads(out.read_text()))

    assert results[0]["seen"] == [0, 1, 2]
    assert results[1]["seen"] == [0, 1, 2]  # remainder dropped, no hang
    assert results[0]["gathered"] == [3, 3]
    assert results[1]["gathered"] == [3, 3]


def test_lockstep_single_process_passthrough():
    from styletransfer_tpu.parallel import distributed

    assert list(distributed.lockstep(iter("abc"))) == ["a", "b", "c"]
    assert list(distributed.lockstep([])) == []
