"""End-to-end engine tests on tiny shapes (CPU, 8-device virtual mesh).

Covers: Gatys optimization decreasing the objective (both optimizers), fast
train step + full static_train epoch loop with checkpoint resume, video scan
training with the freeze mask, and clip inference recurrence semantics.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styletransfer_tpu import ckpt
from styletransfer_tpu.data import coco as coco_data
from styletransfer_tpu.data import video as video_data
from styletransfer_tpu.engines import fast, gatys, video
from styletransfer_tpu.models import transformer, vgg
from styletransfer_tpu.parallel import mesh as mesh_lib
from styletransfer_tpu.utils import images

SIZE = 32


@pytest.fixture(scope="module")
def vgg_params():
    return vgg.init_params(jax.random.PRNGKey(0))


@pytest.fixture
def content_style():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    content = jax.random.normal(k1, (1, SIZE, SIZE, 3)) * 0.5
    style = jax.random.normal(k2, (1, SIZE, SIZE, 3)) * 0.5
    return content, style


def test_gatys_adam_reduces_loss(vgg_params, content_style):
    content, style = content_style
    out, losses = gatys.train_gatys(
        vgg_params, style, content, steps=10, optimizer="adam", log_every=None
    )
    assert out.shape == content.shape
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_gatys_lbfgs_reduces_loss(vgg_params, content_style):
    content, style = content_style
    _, losses = gatys.train_gatys(
        vgg_params, style, content, steps=5, optimizer="lbfgs", log_every=None
    )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_gatys_history_size_flows_through_and_still_converges(
    vgg_params, content_style
):
    """--history-size (the serving-throughput knob): a short history must
    actually reach the optimizer (trajectories diverge from H=100 once the
    ring buffer rolls) while still optimizing. Covers the single-lane
    dispatch and the mixed-style batched serving lane."""
    content, style = content_style
    grams = vgg.style_gram_targets(vgg_params, style)

    _, losses_h2 = gatys.train_gatys(
        vgg_params, style, content, steps=3, optimizer="lbfgs",
        history_size=2, log_every=None,
    )
    _, losses_h100 = gatys.train_gatys(
        vgg_params, style, content, steps=3, optimizer="lbfgs",
        history_size=100, log_every=None,
    )
    assert np.isfinite(losses_h2).all()
    assert losses_h2[-1] < losses_h2[0]
    # 3 contract steps = up to 60 inner iterations >> H=2: the truncated
    # history must produce a different trajectory than the full contract.
    assert not np.allclose(np.asarray(losses_h2), np.asarray(losses_h100))

    # Batched serving lane honors it too.
    contents = jnp.concatenate([content, content * 0.5])
    grams_b = jax.tree.map(lambda g: jnp.stack([g, g]), grams)
    _, lb = gatys._run_serve_batched(
        vgg_params, contents, grams_b, 2, 1e5, 1.0, 0.05, "lbfgs",
        history_size=4,
    )
    assert np.isfinite(np.asarray(lb)).all()
    assert np.asarray(lb).shape == (2, 2)


def test_gatys_coarse_to_fine(vgg_params):
    """--coarse-steps warm start: the coarse stage runs at the reduced
    resolution, its upsampled result really becomes the full-res init
    (the first full-res loss differs from a cold start), and
    coarse_steps=0 stays bit-identical to the default path."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    content = jax.random.normal(k1, (1, 64, 64, 3)) * 0.5
    style = jax.random.normal(k2, (1, SIZE, SIZE, 3)) * 0.5

    cold, cold_losses = gatys.train_gatys(
        vgg_params, style, content, steps=2, optimizer="adam",
        log_every=None,
    )
    warm, warm_losses = gatys.train_gatys(
        vgg_params, style, content, steps=2, optimizer="adam",
        coarse_steps=3, coarse_scale=0.5, log_every=None,
    )
    assert warm.shape == content.shape
    assert np.isfinite(np.asarray(warm_losses)).all()
    assert not np.allclose(warm_losses[0], cold_losses[0])

    again, _ = gatys.train_gatys(
        vgg_params, style, content, steps=2, optimizer="adam",
        coarse_steps=0, log_every=None,
    )
    np.testing.assert_array_equal(np.asarray(cold), np.asarray(again))


def test_gatys_explicit_content_init_is_bit_identical(
    vgg_params, content_style
):
    """init_pixels=content must match the cold path EXACTLY — the
    coarse-bench methodology times one compiled program for both the
    baseline and the warm run (benchmarks/gatys_coarse_bench.py), which
    is only honest if the explicit-init program is the same math."""
    content, style = content_style
    grams = vgg.style_gram_targets(vgg_params, style)
    cold, cold_l = gatys._run_lbfgs_torch(
        vgg_params, content, grams, 2, 1e5, 1.0)
    warm, warm_l = gatys._run_lbfgs_torch(
        vgg_params, content, grams, 2, 1e5, 1.0, init_pixels=content)
    np.testing.assert_array_equal(np.asarray(cold), np.asarray(warm))
    np.testing.assert_array_equal(np.asarray(cold_l), np.asarray(warm_l))


@pytest.mark.parametrize("optimizer", ["lbfgs", "lbfgs-zoom"])
def test_gatys_coarse_to_fine_lbfgs_variants(vgg_params, optimizer):
    """The warm start plumbs through both L-BFGS forms, single and
    batched (the batched form vmaps (init, content) pairs)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    contents = jax.random.normal(k1, (2, 64, 64, 3)) * 0.5
    style = jax.random.normal(k2, (1, SIZE, SIZE, 3)) * 0.5

    cold, cold_losses = gatys.train_gatys(
        vgg_params, style, contents, steps=2, optimizer=optimizer,
        log_every=None,
    )
    warm, warm_losses = gatys.train_gatys(
        vgg_params, style, contents, steps=2, optimizer=optimizer,
        coarse_steps=1, coarse_scale=0.5, log_every=None,
    )
    assert warm.shape == contents.shape
    assert np.isfinite(np.asarray(warm_losses)).all()
    assert not np.allclose(np.asarray(warm_losses), np.asarray(cold_losses))


@pytest.mark.parametrize("optimizer", ["lbfgs", "lbfgs-zoom"])
def test_gatys_batched_lbfgs_images_are_independent(vgg_params, optimizer):
    """Batch elements must follow fully independent trajectories: the
    curvature history (s.y, y.y dots), step sizes, and tolerance breaks
    are per-image state. A coupled flat-vector L-BFGS mixes images through
    its history dot-products, so changing image 2 would perturb image 1's
    result at O(1); in the vmapped form image 1's lanes never read image
    2's content at all."""
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    style = jax.random.normal(k1, (1, SIZE, SIZE, 3)) * 0.5
    img1 = jax.random.normal(k2, (1, SIZE, SIZE, 3)) * 0.5
    img2 = jax.random.normal(k3, (1, SIZE, SIZE, 3)) * 0.8 + 0.2
    img2b = jax.random.normal(k4, (1, SIZE, SIZE, 3)) * 0.3 - 0.5

    out_a, _ = gatys.train_gatys(
        vgg_params, style, jnp.concatenate([img1, img2]), steps=3,
        optimizer=optimizer, log_every=None,
    )
    out_b, _ = gatys.train_gatys(
        vgg_params, style, jnp.concatenate([img1, img2b]), steps=3,
        optimizer=optimizer, log_every=None,
    )
    np.testing.assert_allclose(
        np.asarray(out_a[0]), np.asarray(out_b[0]), atol=1e-6
    )
    # And the swapped partner really did optimize differently.
    assert float(jnp.max(jnp.abs(out_a[1] - out_b[1]))) > 0.1


def test_gatys_batched_lbfgs_matches_single_runs_short_horizon(vgg_params):
    """Over a short horizon (before f32 reassociation noise amplifies
    through the chaotic optimization — measured eps-level at 1-2 inner
    iterations, growing ~10x per iteration after) a batched run equals the
    stacked single-image runs."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    style = jax.random.normal(k1, (1, SIZE, SIZE, 3)) * 0.5
    contents = jnp.concatenate([
        jax.random.normal(k2, (1, SIZE, SIZE, 3)) * 0.5,
        jax.random.normal(k3, (1, SIZE, SIZE, 3)) * 0.8 + 0.2,
    ])
    grams = vgg.style_gram_targets(vgg_params, style)
    out_b, _ = gatys._run_lbfgs_torch(
        vgg_params, contents, grams, 1, 1e5, 1.0, max_iter=2
    )
    for i in range(2):
        out_i, _ = gatys._run_lbfgs_torch(
            vgg_params, contents[i : i + 1], grams, 1, 1e5, 1.0, max_iter=2
        )
        np.testing.assert_allclose(
            np.asarray(out_b[i]), np.asarray(out_i[0]), atol=1e-4
        )


def test_fast_train_step_updates_params_and_reduces_loss(vgg_params):
    mesh = mesh_lib.get_mesh()
    style = jax.random.normal(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 0.5
    grams = vgg.style_gram_targets(vgg_params, style)
    params = transformer.init_params(jax.random.PRNGKey(0))
    # Moderate style weight for stability at this tiny scale/random VGG.
    opt, step = fast.make_train_step(vgg_params, grams, style_weight=1_000.0)
    opt_state = opt.init(params)

    batch = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (8, SIZE, SIZE, 3)) * 0.5
    )
    batch_dev = mesh_lib.shard_batch(batch, mesh)

    initial_kernel = np.asarray(params["conv1"]["kernel"])
    totals = []
    for i in range(15):
        params, opt_state, metrics = step(params, opt_state, batch_dev)
        totals.append(float(metrics["total"]))
    assert np.isfinite(totals).all()
    # Optimization makes progress (not necessarily monotone over few steps).
    assert min(totals) < totals[0]
    assert not np.allclose(np.asarray(params["conv1"]["kernel"]), initial_kernel)


def test_fast_static_train_epoch_checkpoint_and_resume(tmp_path, vgg_params):
    models_path = str(tmp_path / "models")
    runs = str(tmp_path / "runs")
    style = jax.random.normal(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 0.5

    class TinyDS(coco_data.SyntheticDataset):
        pass

    train_loader = coco_data.DataLoader(TinyDS(16, SIZE), batch_size=8)
    test_loader = coco_data.DataLoader(TinyDS(8, SIZE), batch_size=8)

    params = fast.static_train(
        style, style_name="tst", epochs=2, batch_size=8,
        vgg_params=vgg_params,
        train_loader=train_loader, test_loader=test_loader,
        models_path=models_path, runs_dir=runs, max_steps_per_epoch=2,
    )
    assert ckpt.epoch_checkpoint_exists("fast_st", "tst", 0, models_path)
    assert ckpt.epoch_checkpoint_exists("fast_st", "tst", 1, models_path)

    # Resume: both epochs exist -> they're skipped and the latest is loaded.
    params2 = fast.static_train(
        style, style_name="tst", epochs=2, batch_size=8,
        vgg_params=vgg_params,
        train_loader=train_loader, test_loader=test_loader,
        models_path=models_path, runs_dir=runs, max_steps_per_epoch=2,
    )
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_process_image_writes_output(tmp_path, tmp_image, vgg_params):
    params = transformer.init_params(jax.random.PRNGKey(0))
    out = fast.process_image(
        tmp_image, style_name="tst", out_dir=str(tmp_path / "results"), params=params
    )
    assert os.path.isfile(out)
    assert out.endswith("converted_fast_st_tst.png")


def test_video_scan_train_step_and_freeze_mask(vgg_params):
    style = jax.random.normal(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 0.5
    grams = vgg.style_gram_targets(vgg_params, style)
    fast_params = transformer.init_params(jax.random.PRNGKey(0))
    params = transformer.init_video_params(jax.random.PRNGKey(1), fast_params)
    opt, scan_step = video.make_scan_train_step(vgg_params, grams)
    opt_state = opt.init(params)

    frames = jax.random.normal(jax.random.PRNGKey(4), (3, 2, SIZE, SIZE, 3)) * 0.5
    old = frames[0]
    mask = video.freeze_mask(params, freeze_all_but_first=True)
    valid = jnp.ones(3, dtype=bool)

    # The step donates params/opt_state; snapshot compared leaves first.
    res1_before = np.asarray(params["res1"]["conv1"]["kernel"]).copy()
    conv1_before = np.asarray(params["conv1"]["kernel"]).copy()

    new_params, opt_state, old_c, old_s, metrics = scan_step(
        params, opt_state, frames, valid, old, old, mask
    )
    assert metrics["total"].shape == (3,)
    assert np.isfinite(np.asarray(metrics["total"])).all()
    # Frozen layers unchanged; first conv trained.
    np.testing.assert_allclose(
        np.asarray(new_params["res1"]["conv1"]["kernel"]), res1_before
    )
    assert not np.allclose(np.asarray(new_params["conv1"]["kernel"]), conv1_before)
    # Carry holds the last content frame.
    np.testing.assert_allclose(np.asarray(old_c), np.asarray(frames[-1]), atol=1e-6)


def test_padded_tail_frames_take_no_update(vgg_params):
    """5 frames trained with chunk=4 (tail padded by repeating frame 5) must
    produce BITWISE-identical params to chunk=5 (no padding): padded frames
    take no optimizer update and are excluded from iteration counting — the
    reference trains only on real frames (network.py:974-1037)."""
    style = jax.random.normal(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 0.5
    grams = vgg.style_gram_targets(vgg_params, style)
    frames = np.asarray(
        jax.random.normal(jax.random.PRNGKey(4), (5, 1, SIZE, SIZE, 3)) * 0.5
    )

    def run(chunk_size):
        fast_params = transformer.init_params(jax.random.PRNGKey(0))
        params = transformer.init_video_params(jax.random.PRNGKey(1), fast_params)
        opt, scan_step = video.make_scan_train_step(vgg_params, grams)
        opt_state = opt.init(params)
        mask = video.freeze_mask(params, False)
        old_c = old_s = None
        n_updates = 0
        for chunk, valid in video._chunk_frames(
            iter(list(frames)), chunk_size, pad_tail=True
        ):
            chunk = jnp.asarray(chunk)
            if old_c is None:
                old_c = chunk[0]
                old_s = old_c
            params, opt_state, old_c, old_s, _ = scan_step(
                params, opt_state, chunk, jnp.asarray(valid), old_c, old_s, mask
            )
            n_updates += int(valid.sum())
        return params, n_updates

    p4, n4 = run(4)
    p5, n5 = run(5)
    assert n4 == n5 == 5
    for a, b in zip(jax.tree_util.tree_leaves(p4), jax.tree_util.tree_leaves(p5)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunk_frames_validity_masks():
    frames = [np.zeros((1, 4, 4, 3), np.float32) for _ in range(5)]
    chunks = list(video._chunk_frames(iter(frames), 4, pad_tail=True))
    assert len(chunks) == 2
    (c0, v0), (c1, v1) = chunks
    assert c0.shape == c1.shape == (4, 1, 4, 4, 3)
    assert v0.all()
    np.testing.assert_array_equal(v1, [True, False, False, False])


def test_video_train_end_to_end_synthetic(tmp_path, vgg_params):
    models_path = str(tmp_path / "models")
    style = jax.random.normal(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 0.5
    loader = video_data.VideoDataset(
        videos=[0, 1], batch_size=2, size=SIZE, synthetic_fallback=True
    )
    loader.synthetic = True
    # Keep it tiny: 2 videos of default synthetic length, 1 epoch, chunk 4.
    params = video.video_train(
        style, style_name="vtst", epochs=1, batch_size=2,
        vgg_params=vgg_params, video_loader=loader,
        chunk_size=4, max_frames=6,
        models_path=models_path, runs_dir=str(tmp_path / "runs"),
    )
    assert ckpt.epoch_checkpoint_exists("video_st", "vtst", 0, models_path)
    assert params["conv1"]["kernel"].shape == (9, 9, 6, 32)


def test_stylize_clip_recurrence_matches_manual(vgg_params):
    params = transformer.init_video_params(jax.random.PRNGKey(5))
    frames = np.asarray(
        jax.random.normal(jax.random.PRNGKey(6), (3, SIZE, SIZE, 3)) * 0.5
    )
    outs = video.stylize_clip(params, frames)
    assert outs.shape == frames.shape

    # Manual recurrence: first frame pairs with itself.
    prev = jnp.asarray(frames[0:1])
    expected = []
    for t in range(3):
        inp = jnp.concatenate([jnp.asarray(frames[t : t + 1]), prev], axis=-1)
        prev = transformer.apply(params, inp)
        expected.append(np.asarray(prev[0]))
    np.testing.assert_allclose(outs, np.stack(expected), rtol=1e-4, atol=1e-5)


def test_stylize_clip_uint8_matches_float():
    """stylize_clip on uint8 frames (the loaders' serving output format)
    must equal the float path — including the FIRST frame, whose carry
    seed bypasses the scan body's in-graph normalize and once fed raw
    0-255 values into channels expecting model space."""
    params = transformer.init_video_params(jax.random.PRNGKey(7))
    rng = np.random.default_rng(8)
    u8 = rng.integers(0, 256, (3, SIZE, SIZE, 3), dtype=np.uint8)
    f32 = np.asarray(images.maybe_normalize_on_device(jnp.asarray(u8)))

    out_u8 = video.stylize_clip(params, u8)
    out_f32 = video.stylize_clip(params, f32)
    np.testing.assert_allclose(out_u8, out_f32, rtol=1e-4, atol=1e-5)


def test_bf16_training_step_finite(vgg_params):
    import jax.numpy as jnp

    style = jax.random.normal(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 0.5
    grams = vgg.style_gram_targets(vgg_params, style)
    params = transformer.init_params(jax.random.PRNGKey(0))
    opt, step = fast.make_train_step(
        vgg_params, grams, style_weight=1000.0, compute_dtype=jnp.bfloat16
    )
    opt_state = opt.init(params)
    batch = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (8, SIZE, SIZE, 3)) * 0.5
    )
    params, opt_state, metrics = step(params, opt_state, jnp.asarray(batch))
    assert np.isfinite(float(metrics["total"]))
    # params stay f32 (mixed precision: only activations are bf16)
    assert params["conv1"]["kernel"].dtype == jnp.float32


def test_gatys_bf16_precision_mode(vgg_params, content_style):
    content, style = content_style
    out, losses = gatys.train_gatys(
        vgg_params, style, content, steps=5, optimizer="adam",
        log_every=None, precision="bf16",
    )
    assert out.dtype == jnp.float32  # pixels stay f32
    assert np.isfinite(losses).all()


def test_remat_train_step_matches_plain(vgg_params):
    style = jax.random.normal(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 0.5
    grams = vgg.style_gram_targets(vgg_params, style)
    batch = jax.random.normal(jax.random.PRNGKey(3), (4, SIZE, SIZE, 3)) * 0.5

    results = []
    for remat in (False, True):
        params = transformer.init_params(jax.random.PRNGKey(0))
        opt, step = fast.make_train_step(
            vgg_params, grams, style_weight=1000.0, remat=remat
        )
        p, s, m = step(params, opt.init(params), batch)
        results.append((p, float(m["total"])))
    (p0, l0), (p1, l1) = results
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_process_dir_batched_conversion(tmp_path, rng):
    """convert-dir: every readable image in the directory is stylized with
    one compiled program (ragged tail padded), unreadable files skipped."""
    from PIL import Image

    in_dir = tmp_path / "imgs"
    in_dir.mkdir()
    for i in range(5):
        arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(in_dir / f"pic{i}.png")
    (in_dir / "broken.jpg").write_bytes(b"not an image")
    (in_dir / "notes.txt").write_text("ignored")

    params = transformer.init_params(jax.random.PRNGKey(0))
    outs = fast.process_dir(
        str(in_dir), style_name="tst", out_dir=str(tmp_path / "results"),
        batch_size=2, params=params, size=32,
    )
    assert len(outs) == 5
    assert all(os.path.isfile(p) for p in outs)
    assert sorted(os.path.basename(p) for p in outs) == [
        f"converted_fast_st_tst_pic{i}.png" for i in range(5)
    ]
    # Batched result == single-image result for the same input (both go
    # through the same denormalize+clamp save path).
    from styletransfer_tpu.utils import images as img_utils

    one = transformer.apply(
        params, jnp.asarray(img_utils.load_image(str(in_dir / "pic0.png"), size=32))
    )
    img_utils.save_image(np.asarray(one), str(tmp_path / "single.png"))
    got = np.asarray(Image.open(outs[0])).astype(np.float32)
    want = np.asarray(Image.open(str(tmp_path / "single.png"))).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1.0)


def test_serve_loop_daemon_protocol(tmp_path, rng):
    """fast_st serve: READY after compile, one OK/ERR line per request
    (default naming + explicit TAB output), per-request errors don't kill
    the daemon, blank line shuts it down."""
    import io

    from PIL import Image

    img = tmp_path / "photo.png"
    arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    Image.fromarray(arr).save(img)
    explicit_out = tmp_path / "out" / "custom.png"

    params = transformer.init_params(jax.random.PRNGKey(0))
    stdin = io.StringIO(
        f"{img}\n"
        f"{img}\t{explicit_out}\n"
        f"{tmp_path / 'missing.png'}\n"
        "\n"
        f"{img}\n"  # after the blank-line shutdown: must NOT be served
    )
    stdout = io.StringIO()
    n = fast.serve_loop(
        style_name="tst", out_dir=str(tmp_path / "results"), params=params,
        size=32, stdin=stdin, stdout=stdout,
    )
    assert n == 2
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "READY"
    assert lines[1] == "OK " + str(tmp_path / "results" / "converted_fast_st_tst_photo.png")
    assert lines[2] == "OK " + str(explicit_out)
    assert lines[3].startswith("ERR ") and "missing.png" in lines[3]
    assert len(lines) == 4
    assert os.path.isfile(explicit_out)

    # The daemon's output is the single-image serving path bit-for-bit.
    single = fast.process_image(
        str(img), style_name="tst", out_dir=str(tmp_path / "single"),
        params=params, size=32,
    )
    got = np.asarray(Image.open(lines[1][3:]))
    want = np.asarray(Image.open(single))
    np.testing.assert_array_equal(got, want)


def test_serve_loop_dynamic_batching(tmp_path, rng):
    """serve --batch N: queued requests are drained and served in one
    device call; responses stay in request order (errors included) and the
    outputs are bit-identical to the unbatched daemon's."""
    import io

    from PIL import Image

    imgs = []
    for i in range(5):
        p = tmp_path / f"in{i}.png"
        Image.fromarray(
            rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        ).save(p)
        imgs.append(p)
    params = transformer.init_params(jax.random.PRNGKey(0))

    # 5 good requests + 1 missing + 1 malformed, all pre-queued (StringIO
    # delivers them instantly, so the loop forms multi-request groups).
    reqs = [str(p) for p in imgs]
    reqs.insert(2, str(tmp_path / "missing.png"))
    reqs.insert(4, f"{imgs[0]}\ta\tb\tc")  # 4 fields: malformed
    stdin = io.StringIO("\n".join(reqs) + "\n\n")
    stdout = io.StringIO()
    n = fast.serve_loop(
        style_name="tst", out_dir=str(tmp_path / "batched"), params=params,
        size=32, batch_size=3, stdin=stdin, stdout=stdout,
    )
    assert n == 5
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "READY"
    # Responses in request order: OK OK ERR OK ERR OK OK.
    kinds = [l.split()[0] for l in lines[1:]]
    assert kinds == ["OK", "OK", "ERR", "OK", "ERR", "OK", "OK"]
    assert "missing.png" in lines[3]
    assert "fields" in lines[5]

    # Bit-identical to the unbatched daemon on the same inputs.
    stdin1 = io.StringIO("\n".join(str(p) for p in imgs) + "\n\n")
    stdout1 = io.StringIO()
    fast.serve_loop(
        style_name="tst", out_dir=str(tmp_path / "single"), params=params,
        size=32, batch_size=1, stdin=stdin1, stdout=stdout1,
    )
    single_ok = [l.split(" ", 1)[1] for l in stdout1.getvalue().splitlines()
                 if l.startswith("OK")]
    batched_ok = [l.split(" ", 1)[1] for l in lines[1:] if l.startswith("OK")]
    for b, s in zip(batched_ok, single_ok):
        np.testing.assert_array_equal(
            np.asarray(Image.open(b)), np.asarray(Image.open(s))
        )


def test_daemon_split_fields_trailing_tabs():
    """Trailing empty fields are dropped, so 'RESET\\t\\t' is bare RESET in
    batched mode exactly as the serial loop's line.strip() command match
    sees it — identical client bytes must not diverge between modes."""
    from styletransfer_tpu.engines import daemon

    assert daemon.split_fields("RESET\t\t") == ["RESET"]
    assert daemon.split_fields("RESET\t") == ["RESET"]
    assert daemon.split_fields("RELOAD\t") == ["RELOAD"]
    assert daemon.split_fields("img\t\tA") == ["img", "", "A"]
    assert daemon.split_fields("img\tout\t") == ["img", "out"]
    assert daemon.split_fields("img\t") == ["img"]
    assert daemon.split_fields("a\tb") == ["a", "b"]


def test_segmented_submit_batch_unit():
    """segmented_submit_batch: bare command lines split the group into
    ordered segments; a failing command answers ERR for its line only and
    later segments still run."""
    from styletransfer_tpu.engines import daemon

    calls = []

    def submit_segment(segment, results):
        if segment:
            calls.append([i for i, _ in segment])

        def finalize():
            for i, fields in segment:
                results[i] = f"done-{fields[0]}"

        return finalize

    state = {"n": 0}

    def cmd():
        state["n"] += 1
        if state["n"] == 2:
            raise RuntimeError("boom")
        return f"CMD {state['n']}"

    sb = daemon.segmented_submit_batch(submit_segment, {"CMD": cmd})
    results = sb([["a"], ["CMD"], ["b"], ["CMD"], ["c"]])()
    assert results[0] == "done-a"
    assert results[1] == "CMD 1"
    assert results[2] == "done-b"
    assert isinstance(results[3], RuntimeError)
    assert results[4] == "done-c"
    assert calls == [[0], [2], [4]]  # segments in order, split at commands


def test_daemon_sigterm_finishes_inflight_request_then_exits():
    """Graceful SIGTERM while BUSY: a signal arriving mid-request defers —
    the in-flight response is still written, then the loop exits before
    reading the next queued line (the supervisor stop contract)."""
    import io
    import os
    import signal

    from styletransfer_tpu.engines import daemon

    def handle(*fields):
        os.kill(os.getpid(), signal.SIGTERM)  # arrives while busy
        return f"done-{fields[0]}"

    stdin = io.StringIO("a\nb\nc\n\n")
    stdout = io.StringIO()
    n = daemon.run_request_loop(handle, stdin=stdin, stdout=stdout, name="t")
    assert n == 1
    assert stdout.getvalue().splitlines() == ["OK done-a"]
    # The loop restored the process's previous SIGTERM disposition.
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL


def test_daemon_sigterm_while_idle_exits_serial_loop():
    """Graceful SIGTERM while IDLE: a signal during the blocking read
    raises out of it and the serial loop shuts down cleanly (stats still
    reported, served count returned)."""
    import os
    import signal
    import time

    from styletransfer_tpu.engines import daemon

    class _Stdin:
        def __init__(self):
            self.calls = 0

        def __iter__(self):
            return self

        def __next__(self):
            self.calls += 1
            if self.calls == 1:
                return "a\n"
            os.kill(os.getpid(), signal.SIGTERM)
            time.sleep(30)  # the signal interrupts this "blocked read"
            raise AssertionError("signal never delivered")

    import io

    stdout = io.StringIO()
    n = daemon.run_request_loop(
        lambda *f: f"done-{f[0]}", stdin=_Stdin(), stdout=stdout, name="t"
    )
    assert n == 1
    assert stdout.getvalue().splitlines() == ["OK done-a"]


def test_daemon_sigterm_batched_loop_answers_then_exits():
    """Graceful SIGTERM on the batched loop: the daemon answers the group
    in flight (drain) and exits cleanly whether the signal lands while
    busy or at the idle q.get()."""
    import io
    import os
    import signal
    import threading

    from styletransfer_tpu.engines import daemon

    answered = threading.Event()

    class _Stdout:
        def __init__(self):
            self.buf = io.StringIO()

        def write(self, s):
            self.buf.write(s)
            if "OK " in s:
                answered.set()
            return len(s)

        def flush(self):
            pass

    class _Stdin:
        """One request, then block forever (a live client gone quiet)."""

        def __init__(self):
            self.calls = 0
            self.gate = threading.Event()

        def __iter__(self):
            return self

        def __next__(self):
            self.calls += 1
            if self.calls == 1:
                return "a\n"
            self.gate.wait(60)
            raise StopIteration

    def kill_after_answer():
        assert answered.wait(30)
        os.kill(os.getpid(), signal.SIGTERM)

    killer = threading.Thread(target=kill_after_answer, daemon=True)
    killer.start()
    stdin = _Stdin()
    stdout = _Stdout()
    n = daemon.run_batched_request_loop(
        lambda work: [f"done-{f[0]}" for f in work], max_batch=4,
        stdin=stdin, stdout=stdout, name="t",
    )
    stdin.gate.set()
    killer.join(10)
    assert n == 1
    assert stdout.buf.getvalue().splitlines() == ["OK done-a"]


def test_daemon_second_signal_aborts_batched_work():
    """The operator-insists contract: a SECOND signal while the batched
    loop is busy aborts the current work in place (no response for the
    aborted group) instead of waiting out the drain — a supervisor that
    escalates must not be forced to SIGKILL."""
    import io
    import os
    import signal

    from styletransfer_tpu.engines import daemon

    def handle_batch(work):
        os.kill(os.getpid(), signal.SIGTERM)  # first: deferred
        os.kill(os.getpid(), signal.SIGTERM)  # second: raises in place
        raise AssertionError("second signal must abort before returning")

    stdin = io.StringIO("a\nb\n\n")
    stdout = io.StringIO()
    n = daemon.run_batched_request_loop(
        handle_batch, max_batch=4, stdin=stdin, stdout=stdout, name="t",
    )
    assert n == 0
    assert stdout.getvalue() == ""  # aborted group answers nothing
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL


def test_daemon_pipelined_loop_overlaps_and_orders():
    """submit_batch opts the batched loop into wave pipelining: with
    requests already queued, the loop SUBMITS group k+1 before FINALIZING
    group k (the overlap that hides host IO behind the device round-trip),
    while responses still stream strictly in request order and every
    group finalizes FIFO."""
    import io

    from styletransfer_tpu.engines import daemon

    events = []

    def submit_batch(work):
        gid = len([e for e in events if e[0] == "submit"])
        events.append(("submit", gid))

        def finalize():
            events.append(("finalize", gid))
            return [fields[0] for fields in work]

        return finalize

    stdin = io.StringIO("".join(f"r{i}\n" for i in range(8)) + "\n")
    stdout = io.StringIO()
    n = daemon.run_batched_request_loop(
        None, max_batch=2, stdin=stdin, stdout=stdout, name="t",
        submit_batch=submit_batch, depth=1,
    )
    assert n == 8
    assert stdout.getvalue().splitlines() == [f"OK r{i}" for i in range(8)]
    # Finalizes happen FIFO and every submitted group finalizes.
    fin_order = [g for kind, g in events if kind == "finalize"]
    assert fin_order == sorted(fin_order)
    assert len(fin_order) == len([e for e in events if e[0] == "submit"])
    # The overlap actually happened: with the whole burst pre-queued, at
    # least one group was submitted before the previous one finalized.
    overlapped = any(
        events.index(("submit", g + 1)) < events.index(("finalize", g))
        for g in range(len(fin_order) - 1)
    )
    assert overlapped


def test_daemon_pipelined_loop_depth0_is_serial():
    """depth=0 restores the strictly serial schedule: every group
    finalizes before the next submit (the pre-pipelining behavior, kept
    reachable via STX_SERVE_PIPELINE_DEPTH=0)."""
    import io

    from styletransfer_tpu.engines import daemon

    events = []

    def submit_batch(work):
        gid = len([e for e in events if e[0] == "submit"])
        events.append(("submit", gid))

        def finalize():
            events.append(("finalize", gid))
            return [fields[0] for fields in work]

        return finalize

    stdin = io.StringIO("".join(f"r{i}\n" for i in range(6)) + "\n")
    stdout = io.StringIO()
    daemon.run_batched_request_loop(
        None, max_batch=2, stdin=stdin, stdout=stdout, name="t",
        submit_batch=submit_batch, depth=0,
    )
    # Strict alternation: submit g, finalize g, submit g+1, ...
    assert events == [
        (kind, g) for g in range(len(events) // 2)
        for kind in ("submit", "finalize")
    ]


def test_daemon_pipelined_submit_failure_answers_err():
    """A submit_batch that raises (not just a finalize failure) answers
    the whole group ERR and the daemon keeps serving later groups."""
    import io

    from styletransfer_tpu.engines import daemon

    def submit_batch(work):
        if any(fields[0] == "bad" for fields in work):
            raise RuntimeError("submit exploded")
        results = [fields[0] for fields in work]
        return lambda: results

    # max_batch=1 so 'bad' cannot share a group with its neighbors.
    stdin = io.StringIO("a\nbad\nb\n\n")
    stdout = io.StringIO()
    n = daemon.run_batched_request_loop(
        None, max_batch=1, stdin=stdin, stdout=stdout, name="t",
        submit_batch=submit_batch, depth=1,
    )
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "OK a"
    assert lines[1].startswith("ERR bad: submit exploded")
    assert lines[2] == "OK b"
    assert n == 2


def test_segmented_submit_batch_reload_ordering():
    """segmented_submit_batch preserves the command-ordering contract:
    segment dispatches BEFORE the command bind the pre-command state,
    dispatches after it see the new state — even though every fetch
    happens later, in one finalize."""
    from styletransfer_tpu.engines import daemon

    state = {"v": "old"}
    log = []

    def submit_segment(segment, results):
        bound = state["v"]  # captured at dispatch time, like jit args
        log.append(("submit", [i for i, _ in segment], bound))

        def finalize():
            for i, fields in segment:
                results[i] = f"{fields[0]}@{bound}"

        return finalize

    def reload():
        state["v"] = "new"
        return "RELOAD ok"

    sb = daemon.segmented_submit_batch(submit_segment, {"RELOAD": reload})
    fin = sb([["a"], ["RELOAD"], ["b"]])
    results = fin()
    assert results == ["a@old", "RELOAD ok", "b@new"]


def test_daemon_stats_command_serial():
    """A bare STATS line answers the loop's own health summary in-band —
    counted like the other commands (not a served request) and reflecting
    exactly the requests answered before it."""
    import io

    from styletransfer_tpu.engines import daemon

    def handle(*fields):
        if fields[0] == "boom":
            raise ValueError("x")
        return fields[0].upper()

    stdin = io.StringIO("a\nSTATS\nboom\nSTATS\n\n")
    stdout = io.StringIO()
    n = daemon.run_request_loop(handle, stdin=stdin, stdout=stdout, name="t")
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "OK A"
    assert lines[1].startswith("OK STATS ok=1 err=0")
    assert "p50_ms=" in lines[1] and "mean_ms=" in lines[1]
    assert lines[2].startswith("ERR boom")
    assert lines[3].startswith("OK STATS ok=1 err=1")
    assert n == 1


def test_daemon_stats_command_batched():
    """STATS lines inside a batched burst are answered by the loop, in
    request order, and never reach handle_batch."""
    import io

    from styletransfer_tpu.engines import daemon

    def handle_batch(requests):
        assert ["STATS"] not in requests
        return ["+".join(f).upper() for f in requests]

    stdin = io.StringIO("a\nSTATS\nb\tc\nSTATS\n\n")
    stdout = io.StringIO()
    n = daemon.run_batched_request_loop(
        handle_batch, max_batch=8, stdin=stdin, stdout=stdout, name="t"
    )
    lines = stdout.getvalue().splitlines()
    # One response per line, in order, whatever the dynamic grouping was.
    assert lines[0] == "OK A"
    assert lines[1].startswith("OK STATS ok=")
    assert lines[2] == "OK B+C"
    assert lines[3].startswith("OK STATS ok=")
    assert n == 2  # STATS lines are not served requests


def test_daemon_batched_stats_true_per_request_latency():
    """Batched-mode STATS reports TRUE enqueue→reply per-request latency
    as the primary metric, keeping the group-amortized figure as a
    secondary field — and the true tails are never below the amortized
    mean (every request in a group waits at least the whole group's
    elapsed time, which is n× the amortized per-request figure)."""
    import io
    import time

    from styletransfer_tpu.engines import daemon

    def handle_batch(requests):
        time.sleep(0.05)  # one measurable device wave for the group
        return [f[0].upper() for f in requests]

    # One piped burst => one group of 4 (max_batch=4), so the trailing
    # STATS lands in the NEXT group and sees the burst's recorded stats
    # (a same-group STATS snapshots pre-finalize state, by contract).
    stdin = io.StringIO("a\nb\nc\nd\nSTATS\n\n")
    stdout = io.StringIO()
    daemon.run_batched_request_loop(
        handle_batch, max_batch=4, stdin=stdin, stdout=stdout, name="t"
    )
    lines = stdout.getvalue().splitlines()
    stats_line = next(l for l in lines if l.startswith("OK STATS ok=4"))
    kv = dict(tok.split("=", 1) for tok in stats_line.split()[2:])
    assert kv["latency"] == "enqueue-to-reply"
    p50, p95 = float(kv["p50_ms"]), float(kv["p95_ms"])
    amort_mean = float(kv["amort_mean_ms"])
    assert float(kv["mean_batch_fill"]) == 4.0
    # True per-request latency ≥ the group wave (≈50 ms) ≥ amortized mean
    # (≈12.5 ms); tails at or above the median.
    assert p50 >= amort_mean
    assert p95 >= p50 >= 45.0
    assert amort_mean <= p50 / 2  # 4-fill group: amortized is 1/4 the wave


def test_daemon_batched_loop_bounded_queue_flood():
    """The batched loop's internal queue is bounded (backpressure: a
    flooding client blocks at the pipe/socket instead of growing an
    unbounded host backlog). A burst far beyond the bound must still be
    served completely, in order."""
    import io

    from styletransfer_tpu.engines import daemon

    def handle_batch(requests):
        return [fields[0] for fields in requests]

    n_flood = 500  # >> the 64-line minimum bound at max_batch=2
    stdin = io.StringIO("".join(f"r{i}\n" for i in range(n_flood)) + "\n")
    stdout = io.StringIO()
    n = daemon.run_batched_request_loop(
        handle_batch, max_batch=2, stdin=stdin, stdout=stdout, name="t"
    )
    assert n == n_flood
    lines = stdout.getvalue().splitlines()
    assert lines == [f"OK r{i}" for i in range(n_flood)]


def test_daemon_stats_logged(tmp_path, rng, caplog):
    """The daemon loops log per-request latency percentiles (and batch
    fill, in batched mode) at shutdown — daemon health from stderr alone."""
    import io
    import logging

    from PIL import Image

    params = transformer.init_params(jax.random.PRNGKey(0))
    img = tmp_path / "in.png"
    Image.fromarray(
        rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    ).save(img)

    with caplog.at_level(logging.INFO, logger="StyleTransfer"):
        fast.serve_loop(
            style_name="tst", out_dir=str(tmp_path / "results"),
            params=params, size=32, batch_size=2,
            stdin=io.StringIO(f"{img}\n{img}\nmissing.png\n\n"),
            stdout=io.StringIO(),
        )
    msgs = [r.getMessage() for r in caplog.records]
    final = [m for m in msgs if "per-request ms" in m]
    assert final, msgs
    assert any("batch fill" in m for m in final)
    assert any("2 ok / 1 err" in m for m in final)


def test_fast_serve_reload_swaps_checkpoint(tmp_path, rng):
    """RELOAD swaps the latest checkpoint into a running daemon without
    recompiling; in batched mode it splits its group (before = old params,
    after = new); a failed RELOAD answers ERR and keeps the old params."""
    import io

    from PIL import Image

    from styletransfer_tpu import ckpt as ckpt_mod
    from styletransfer_tpu.utils import images as img_utils

    p_old = transformer.init_params(jax.random.PRNGKey(1))
    p_new = transformer.init_params(jax.random.PRNGKey(2))
    models = str(tmp_path / "models")
    ckpt_mod.save_epoch(p_new, "fast_st", "tst", 0, models)

    img = tmp_path / "in.png"
    Image.fromarray(
        rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    ).save(img)
    o1, o2 = tmp_path / "o1.png", tmp_path / "o2.png"

    stdin = io.StringIO(f"{img}\t{o1}\nRELOAD\n{img}\t{o2}\n\n")
    stdout = io.StringIO()
    fast.serve_loop(
        style_name="tst", out_dir=str(tmp_path / "results"), params=p_old,
        models_path=models, size=32, batch_size=4,
        stdin=stdin, stdout=stdout,
    )
    lines = stdout.getvalue().splitlines()
    assert lines[1].startswith("OK ") and lines[3].startswith("OK ")
    assert lines[2] == "OK RELOAD epoch=0"

    u8 = jnp.asarray(img_utils.load_image_uint8(str(img), size=32))
    serve_fn = fast.make_serve_fn("f32", "reflect")
    want_old = np.asarray(serve_fn(p_old, u8))[0].astype(np.int16)
    want_new = np.asarray(serve_fn(p_new, u8))[0].astype(np.int16)

    def against(path, want):  # jitted-batched vs eager: uint8 rounding +-1
        return np.abs(np.asarray(Image.open(path), np.int16) - want).max()

    assert np.abs(want_old - want_new).max() > 2  # the params really differ
    assert against(o1, want_old) <= 1 and against(o1, want_new) > 2
    assert against(o2, want_new) <= 1 and against(o2, want_old) > 2

    # A RELOAD that finds no checkpoint answers ERR and keeps serving the
    # old params (serial mode exercises the command path's containment).
    stdin = io.StringIO(f"RELOAD\n{img}\t{o1}\n\n")
    stdout = io.StringIO()
    fast.serve_loop(
        style_name="tst", out_dir=str(tmp_path / "results"), params=p_old,
        models_path=str(tmp_path / "empty"), size=32, batch_size=1,
        stdin=stdin, stdout=stdout,
    )
    lines = stdout.getvalue().splitlines()
    assert lines[1].startswith("ERR RELOAD")
    assert lines[2].startswith("OK ")
    assert against(o1, want_old) <= 1  # still the old params


def test_gatys_serve_loop_protocol(tmp_path, rng, vgg_params):
    """gatys serve daemon: per-request (content, style) pairs run through
    one compiled optimization; the response carries the final loss; bad
    requests answer ERR without killing the daemon."""
    import io

    from PIL import Image

    content = tmp_path / "content.png"
    style = tmp_path / "style.png"
    for p in (content, style):
        Image.fromarray(
            rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        ).save(p)

    stdin = io.StringIO(
        f"{content}\t{style}\n"
        f"{content}\n"                      # missing style -> ERR
        f"{tmp_path}/nope.png\t{style}\n"   # unreadable content -> ERR
        "\n"
    )
    stdout = io.StringIO()
    n = gatys.serve_loop(
        steps=3, optimizer="adam", size=32, out_dir=str(tmp_path / "results"),
        vgg_params=vgg_params, stdin=stdin, stdout=stdout,
    )
    assert n == 1
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "READY"
    assert lines[1].startswith("OK ") and "loss=" in lines[1]
    assert lines[2].startswith("ERR ") and lines[3].startswith("ERR ")
    out_path = lines[1].split(" ")[1]
    assert out_path.endswith("gatys_content_style.png")
    assert os.path.isfile(out_path)


def test_parse_style_spec_literal_path_escape(tmp_path):
    """Commas and colons are legal in POSIX filenames: a STYLE value that
    names an EXISTING file is taken literally, never reinterpreted as a
    blend spec — with and without a resolution root."""
    from styletransfer_tpu.engines import gatys

    weird = tmp_path / "style, v2:final.png"
    weird.write_bytes(b"x")
    assert gatys.parse_style_spec(str(weird)) == ([str(weird)], [1.0])
    assert gatys.parse_style_spec(
        "style, v2:final.png", root=str(tmp_path)
    ) == (["style, v2:final.png"], [1.0])
    # Without a matching file the same text parses as a (bad) blend spec.
    with pytest.raises(ValueError):
        gatys.parse_style_spec("style, v2:final.png", root=str(tmp_path / "x"))


def test_gatys_serve_loop_style_blend(tmp_path, rng, vgg_params):
    """STYLE blend spec 'a,b[:w1,w2]': the daemon optimizes toward the
    weighted-average Gram targets. Full weight on one style must equal the
    plain single-style request bitwise (1*g1 + 0*g2 == g1 in f32, same
    compiled program); equal blends get a joined default stem; malformed
    specs answer ERR without killing the daemon."""
    import io

    from PIL import Image

    c = tmp_path / "content.png"
    s1, s2 = tmp_path / "s1.png", tmp_path / "s2.png"
    for p in (c, s1, s2):
        Image.fromarray(
            rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        ).save(p)

    # Explicit OUTPUT fields must be absolute here: a relative OUTPUT is
    # resolved against the real project root (resolve_out_path), and a
    # test must not drop artifacts outside tmp_path.
    stdin = io.StringIO(
        f"{c}\t{s1}\t{tmp_path / 'plain.png'}\n"
        f"{c}\t{s1},{s2}:1,0\t{tmp_path / 'blend10.png'}\n"  # == plain s1, bitwise
        f"{c}\t{s1},{s2}\n"                    # equal blend, default stem
        f"{c}\t{s1},{s2}:0.3\n"                # weight count mismatch -> ERR
        f"{c}\t{s1},{s2}:-1,2\n"               # negative weight -> ERR
        "\n"
    )
    stdout = io.StringIO()
    n = gatys.serve_loop(
        steps=3, optimizer="adam", size=32, out_dir=str(tmp_path / "results"),
        vgg_params=vgg_params, stdin=stdin, stdout=stdout,
    )
    assert n == 3
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "READY"
    assert lines[1].startswith("OK ") and lines[2].startswith("OK ")
    plain = np.asarray(Image.open(lines[1].split(" ")[1]))
    blend10 = np.asarray(Image.open(lines[2].split(" ")[1]))
    np.testing.assert_array_equal(plain, blend10)
    assert lines[3].startswith("OK ")
    # Default stem carries the normalized weights: distinct blends of the
    # same styles must not overwrite each other's default output.
    assert lines[3].split(" ")[1].endswith("gatys_content_s1+s2_0.5_0.5.png")
    blend_eq = np.asarray(Image.open(lines[3].split(" ")[1]))
    assert (blend_eq != plain).any()  # an actual blend differs from s1
    assert "2 style paths but 1 weights" in lines[4]
    assert lines[5].startswith("ERR ")


def test_gatys_serve_loop_batched_mixed_styles(tmp_path, rng, vgg_params):
    """gatys serve with -b N: a group mixing two styles runs as one vmapped
    device call of independent lanes, and each lane's output matches the
    single-request program's on the same (content, style) pair."""
    import io

    from PIL import Image

    c1, c2 = tmp_path / "c1.png", tmp_path / "c2.png"
    s1, s2 = tmp_path / "s1.png", tmp_path / "s2.png"
    for p in (c1, c2, s1, s2):
        Image.fromarray(
            rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        ).save(p)

    def run(batch, lines, sub):
        stdout = io.StringIO()
        gatys.serve_loop(
            steps=3, optimizer="adam", size=32, batch=batch,
            out_dir=str(tmp_path / sub), vgg_params=vgg_params,
            stdin=io.StringIO("".join(lines) + "\n"), stdout=stdout,
        )
        return stdout.getvalue().splitlines()

    # 3 requests, batch=2: one mixed-style group of 2 + a lone request
    # (which routes through the single-lane program). The second request
    # uses an explicit OUTPUT field; it must be honored inside a group.
    exp_b = tmp_path / "eb" / "explicit.png"
    exp_s = tmp_path / "es" / "explicit.png"
    batched = run(2, [f"{c1}\t{s1}\n", f"{c2}\t{s2}\t{exp_b}\n",
                      f"{c1}\t{s2}\n"], "b")
    single = run(1, [f"{c1}\t{s1}\n", f"{c2}\t{s2}\t{exp_s}\n",
                     f"{c1}\t{s2}\n"], "s")
    assert batched[2].split(" ")[1] == str(exp_b) and exp_b.is_file()
    assert batched[0] == single[0] == "READY"
    assert all(l.startswith("OK ") for l in batched[1:] + single[1:])

    for lb, ls in zip(batched[1:], single[1:]):
        path_b, loss_b = lb.split(" ")[1], float(lb.rsplit("loss=", 1)[1])
        path_s, loss_s = ls.split(" ")[1], float(ls.rsplit("loss=", 1)[1])
        assert os.path.basename(path_b) == os.path.basename(path_s)
        np.testing.assert_allclose(loss_b, loss_s, rtol=1e-4)
        # Lane pixels match the single-lane program to uint8 rounding.
        b = np.asarray(Image.open(path_b), dtype=np.int16)
        s = np.asarray(Image.open(path_s), dtype=np.int16)
        assert np.abs(b - s).max() <= 1
    # The two styles actually produced different stylizations.
    o1 = np.asarray(Image.open(batched[1].split(" ")[1]))
    o3 = np.asarray(Image.open(batched[3].split(" ")[1]))
    assert np.abs(o1.astype(np.int16) - o3.astype(np.int16)).max() > 2


def test_serve_loop_rejects_invalid_batch_size(tmp_path):
    import pytest

    params = transformer.init_params(jax.random.PRNGKey(0))
    for bad in (0, -1):
        with pytest.raises(ValueError, match="batch_size"):
            fast.serve_loop(
                style_name="tst", params=params, size=32, batch_size=bad,
            )
    with pytest.raises(ValueError, match="batch"):
        gatys.serve_loop(steps=1, optimizer="adam", size=32, batch=0)
    from styletransfer_tpu.engines import video as video_engine

    vparams = transformer.init_params(jax.random.PRNGKey(0), in_channels=6)
    # Fewer carry slots than wave lanes would evict carries written in the
    # same wave (streams silently restart while answering OK) — rejected.
    with pytest.raises(ValueError, match="max_streams"):
        video_engine.serve_stream_loop(
            style_name="tst", params=vparams, size=32, batch_size=4,
            max_streams=2,
        )


def test_batched_loop_survives_reader_death(tmp_path, rng):
    """A failing stdin (e.g. undecodable bytes) must shut the batched
    daemon down cleanly instead of deadlocking it in q.get()."""
    import io

    from PIL import Image

    img = tmp_path / "p.png"
    Image.fromarray(
        rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    ).save(img)

    class ExplodingStdin:
        """Yields one good request, then raises mid-iteration."""

        def __init__(self):
            self._lines = iter([f"{img}\n"])

        def __iter__(self):
            return self

        def __next__(self):
            try:
                return next(self._lines)
            except StopIteration:
                raise UnicodeDecodeError("utf-8", b"\xff", 0, 1, "bad byte")

    params = transformer.init_params(jax.random.PRNGKey(0))
    stdout = io.StringIO()
    n = fast.serve_loop(
        style_name="tst", out_dir=str(tmp_path / "results"), params=params,
        size=32, batch_size=4, stdin=ExplodingStdin(), stdout=stdout,
    )
    assert n == 1  # the good request was served; then clean shutdown
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "READY" and lines[1].startswith("OK ")


def test_serve_loop_malformed_request_answers_err(tmp_path, rng):
    """A request with too many TAB fields is answered with ERR (not a
    crash) and the daemon keeps serving the next request."""
    import io

    from PIL import Image

    img = tmp_path / "p.png"
    Image.fromarray(
        rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    ).save(img)
    params = transformer.init_params(jax.random.PRNGKey(0))
    stdin = io.StringIO(f"{img}\tx\ty\tz\n{img}\n\n")
    stdout = io.StringIO()
    n = fast.serve_loop(
        style_name="tst", out_dir=str(tmp_path / "results"), params=params,
        size=32, stdin=stdin, stdout=stdout,
    )
    assert n == 1
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "READY"
    # Serial mode must answer the SAME clean protocol error as batched
    # mode — not a leaked Python TypeError from handle(*fields).
    assert lines[1].startswith("ERR ")
    assert "expected INPUT[\\tOUTPUT[\\tSIZE]], got 4 fields" in lines[1]
    assert lines[2].startswith("OK ")


def test_serve_loop_size_buckets(tmp_path, rng):
    """Multi-resolution serving (--sizes): one daemon serves several
    compiled buckets; the optional third field routes each request (first
    listed = default), an un-compiled size answers ERR, and a batched
    group with mixed buckets keeps responses in request order — serial
    and batched daemons must behave identically."""
    import io

    from PIL import Image

    img = tmp_path / "p.png"
    Image.fromarray(
        rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    ).save(img)
    params = transformer.init_params(jax.random.PRNGKey(0))

    requests = (
        f"{img}\t{tmp_path}/d.png\n"        # default bucket (first = 32)
        f"{img}\t{tmp_path}/big.png\t48\n"  # explicit 48 bucket
        f"{img}\t{tmp_path}/x.png\t40\n"    # not a bucket -> ERR
        f"{img}\t{tmp_path}/nan.png\tbig\n" # non-integer SIZE -> ERR
        "\n"
    )
    for batch_size in (1, 3):
        stdin = io.StringIO(requests)
        stdout = io.StringIO()
        n = fast.serve_loop(
            style_name="tst", out_dir=str(tmp_path / "results"),
            params=params, sizes=[32, 48], batch_size=batch_size,
            stdin=stdin, stdout=stdout,
        )
        assert n == 2
        lines = stdout.getvalue().splitlines()
        assert lines[0] == "READY"
        assert lines[1] == f"OK {tmp_path}/d.png"
        assert lines[2] == f"OK {tmp_path}/big.png"
        assert "size 40 not in serving buckets [32, 48]" in lines[3]
        assert "SIZE must be an integer" in lines[4]
        assert Image.open(tmp_path / "d.png").size == (32, 32)
        assert Image.open(tmp_path / "big.png").size == (48, 48)


def test_video_serve_size_buckets_per_stream(tmp_path, rng):
    """video_st serve --sizes: a stream's resolution bucket is fixed by
    its first frame's SIZE field and remembered; changing it mid-stream
    is an ERR until RESET; mixed-bucket waves split per bucket; serial
    and batched daemons must behave identically."""
    import io

    from PIL import Image

    from styletransfer_tpu.engines import video as video_engine

    params = transformer.init_params(jax.random.PRNGKey(0), in_channels=6)
    img = tmp_path / "f.png"
    Image.fromarray(
        rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    ).save(img)

    o = tmp_path
    requests = (
        f"{img}\t{o}/a1.png\tA\n"        # stream A: default bucket 32
        f"{img}\t{o}/b1.png\tB\t48\n"    # stream B: explicit 48
        f"{img}\t{o}/a2.png\tA\t48\n"    # A is 32 -> ERR (RESET to change)
        f"{img}\t{o}/a3.png\tA\n"        # SIZE omitted -> remembered 32
        "RESET\t\tA\n"                   # free stream A
        f"{img}\t{o}/a4.png\tA\t48\n"    # fresh A at 48 -> OK
        f"{img}\t{o}/x.png\tC\t40\n"     # not a compiled bucket -> ERR
        "\n"
    )
    for batch_size in (1, 2):
        stdin = io.StringIO(requests)
        stdout = io.StringIO()
        video_engine.serve_stream_loop(
            style_name="tst", out_dir=str(tmp_path / "results"),
            params=params, sizes=[32, 48], batch_size=batch_size,
            stdin=stdin, stdout=stdout,
        )
        lines = stdout.getvalue().splitlines()
        assert lines[0] == "READY"
        assert lines[1] == f"OK {o}/a1.png"
        assert lines[2] == f"OK {o}/b1.png"
        assert "stream 'A' is 32px; RESET it before changing size to 48" \
            in lines[3]
        assert lines[4] == f"OK {o}/a3.png"
        assert lines[5] == "OK RESET A"
        assert lines[6] == f"OK {o}/a4.png"
        assert "size 40 not in serving buckets [32, 48]" in lines[7]
        assert Image.open(o / "a1.png").size == (32, 32)
        assert Image.open(o / "b1.png").size == (48, 48)
        assert Image.open(o / "a3.png").size == (32, 32)
        assert Image.open(o / "a4.png").size == (48, 48)


def test_video_serve_multi_stream_batched_matches_scan(tmp_path, rng):
    """Two interleaved streams through ONE batched daemon: cross-stream
    waves run as one device call, same-stream requests serialize, each
    stream's outputs stay bit-identical to its own scanned reference, and
    a per-stream RESET restarts only that stream."""
    import io

    from PIL import Image

    from styletransfer_tpu.engines import video as video_engine
    from styletransfer_tpu.utils import images as img_utils

    params = transformer.init_params(jax.random.PRNGKey(0), in_channels=6)
    frames = {}
    for name in ("a0", "a1", "b0", "b1"):
        arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        p = tmp_path / f"{name}.png"
        Image.fromarray(arr).save(p)
        frames[name] = p

    out = {k: tmp_path / f"out_{k}.png" for k in
           ("a0", "a1", "b0", "b1", "a0_again")}
    # One burst: wave 1 = (a0@A, b0@B) batched; wave 2 = (a1@A, b1@B);
    # then RESET stream A only; then a0 again on A (must be fresh) while
    # B's carry must survive the reset of A.
    stdin = io.StringIO(
        f"{frames['a0']}\t{out['a0']}\tA\n"
        f"{frames['b0']}\t{out['b0']}\tB\n"
        f"{frames['a1']}\t{out['a1']}\tA\n"
        f"{frames['b1']}\t{out['b1']}\tB\n"
        "RESET\t\tA\n"
        f"{frames['a0']}\t{out['a0_again']}\tA\n"
        "\n"
    )
    stdout = io.StringIO()
    n = video_engine.serve_stream_loop(
        style_name="tst", out_dir=str(tmp_path / "results"), params=params,
        size=32, batch_size=2, stdin=stdin, stdout=stdout,
    )
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "READY"
    assert all(l.startswith("OK ") for l in lines[1:])
    assert lines[5] == "OK RESET A"
    assert n == 6  # batched loop counts RESET responses too

    def scan_ref(names):
        u8 = jnp.asarray(np.stack(
            [img_utils.load_image_uint8(str(frames[m]), size=32)[0]
             for m in names]
        ))[:, None]
        outs = video_engine._stylize_chunk(
            params, u8, img_utils.maybe_normalize_on_device(u8[0])
        )
        return np.asarray(img_utils.to_uint8_on_device(outs))[:, 0]

    want_a = scan_ref(["a0", "a1"])
    want_b = scan_ref(["b0", "b1"])
    np.testing.assert_array_equal(np.asarray(Image.open(out["a0"])), want_a[0])
    np.testing.assert_array_equal(np.asarray(Image.open(out["a1"])), want_a[1])
    np.testing.assert_array_equal(np.asarray(Image.open(out["b0"])), want_b[0])
    np.testing.assert_array_equal(np.asarray(Image.open(out["b1"])), want_b[1])
    # Post-RESET a0 on stream A pairs with itself again (fresh stream).
    np.testing.assert_array_equal(
        np.asarray(Image.open(out["a0_again"])), want_a[0]
    )


def test_video_serve_eviction_protects_same_wave_streams(tmp_path, rng):
    """At stream capacity, a wave mixing WARM lanes and FRESH lanes must
    evict only streams OUTSIDE the wave: the slot-table allocator skips
    (rotates) the wave's own sids, or an eviction could free a slot whose
    number a warm lane already holds and alias two lanes onto one row.
    Here max_streams=4 is filled by A-D, then one wave serves warm A,B +
    fresh E,F (evicting C,D) — A's and B's later frames must still be
    bit-identical to their scanned references, proving their carries
    survived the capacity wave intact."""
    import io

    from PIL import Image

    from styletransfer_tpu.engines import video as video_engine
    from styletransfer_tpu.utils import images as img_utils

    params = transformer.init_params(jax.random.PRNGKey(0), in_channels=6)
    frames = {}
    for sname, count in (("A", 3), ("B", 3), ("C", 1), ("D", 1),
                         ("E", 1), ("F", 1)):
        for t in range(count):
            arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
            p = tmp_path / f"{sname}{t}.png"
            Image.fromarray(arr).save(p)
            frames[(sname, t)] = p

    # wave 1: A0 B0 C0 D0 (fills capacity) / wave 2: A1 B1 E0 F0 (warm +
    # fresh at capacity -> evicts C, D) / wave 3: A2 B2
    order = [("A", 0), ("B", 0), ("C", 0), ("D", 0),
             ("A", 1), ("B", 1), ("E", 0), ("F", 0),
             ("A", 2), ("B", 2)]
    outs = {k: tmp_path / f"out_{k[0]}{k[1]}.png" for k in order}
    stdin = io.StringIO(
        "".join(f"{frames[k]}\t{outs[k]}\t{k[0]}\n" for k in order) + "\n"
    )
    stdout = io.StringIO()
    n = video_engine.serve_stream_loop(
        style_name="tst", out_dir=str(tmp_path / "results"), params=params,
        size=32, batch_size=4, max_streams=4, stdin=stdin, stdout=stdout,
    )
    assert n == len(order)
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "READY"
    for line, k in zip(lines[1:], order):
        assert line == f"OK {outs[k]}"

    for sname, count in (("A", 3), ("B", 3), ("E", 1), ("F", 1)):
        u8 = jnp.asarray(np.stack([
            img_utils.load_image_uint8(str(frames[(sname, t)]), size=32)[0]
            for t in range(count)
        ]))[:, None]
        ref = video_engine._stylize_chunk(
            params, u8, img_utils.maybe_normalize_on_device(u8[0])
        )
        want = np.asarray(img_utils.to_uint8_on_device(ref))[:, 0]
        for t in range(count):
            got = np.asarray(Image.open(outs[(sname, t)]))
            np.testing.assert_array_equal(got, want[t])


def test_video_serve_lone_lane_eviction_protects_wave(tmp_path, rng):
    """A FRESH stream that rides a wave as the LONE lane of its bucket
    (the run_single path) must not evict a warm stream that has a pending
    lane elsewhere in the SAME wave. At capacity 2 with buckets 32/48:
    wave 1 fills capacity with W,X (32px); wave 2 is [C0 (48px, fresh,
    lone in its bucket), W1 (32px, warm)] — the allocator must evict X
    (the only stream outside the wave), not W (the global LRU), or W1
    would silently restart and diverge from its scanned reference."""
    import io

    from PIL import Image

    from styletransfer_tpu.engines import video as video_engine
    from styletransfer_tpu.utils import images as img_utils

    params = transformer.init_params(jax.random.PRNGKey(0), in_channels=6)
    frames = {}
    for sname, count in (("W", 2), ("X", 1), ("C", 1)):
        for t in range(count):
            arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
            p = tmp_path / f"{sname}{t}.png"
            Image.fromarray(arr).save(p)
            frames[(sname, t)] = p

    # group 1: W0 X0 (fills capacity) / group 2: C0 (48px fresh) + W1
    order = [("W", 0, ""), ("X", 0, ""), ("C", 0, "48"), ("W", 1, "")]
    outs = {(s, t): tmp_path / f"out_{s}{t}.png" for s, t, _ in order}
    stdin = io.StringIO(
        "".join(f"{frames[(s, t)]}\t{outs[(s, t)]}\t{s}\t{sz}\n"
                for s, t, sz in order) + "\n"
    )
    stdout = io.StringIO()
    n = video_engine.serve_stream_loop(
        style_name="tst", out_dir=str(tmp_path / "results"), params=params,
        batch_size=2, max_streams=2, sizes=[32, 48],
        stdin=stdin, stdout=stdout,
    )
    assert n == len(order)
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "READY"
    for line, (s, t, _) in zip(lines[1:], order):
        assert line == f"OK {outs[(s, t)]}"

    for sname, count, size in (("W", 2, 32), ("X", 1, 32), ("C", 1, 48)):
        u8 = jnp.asarray(np.stack([
            img_utils.load_image_uint8(str(frames[(sname, t)]), size=size)[0]
            for t in range(count)
        ]))[:, None]
        ref = video_engine._stylize_chunk(
            params, u8, img_utils.maybe_normalize_on_device(u8[0])
        )
        want = np.asarray(img_utils.to_uint8_on_device(ref))[:, 0]
        for t in range(count):
            got = np.asarray(Image.open(outs[(sname, t)]))
            np.testing.assert_array_equal(got, want[t])


def test_video_serve_slot_table_grows_lazily(tmp_path, rng):
    """The slot table starts at max(8, batch_size) rows and doubles toward
    --max-streams as streams materialize (eager sizing at the cap would
    pin device memory for slots that may never exist). 10 distinct
    streams through a batch-2, max-streams-12 daemon force one growth
    step with NO eviction; carries allocated before the growth (S0) and
    after it (S9) must both survive — their second frames stay
    bit-identical to the scanned reference."""
    import io

    from PIL import Image

    from styletransfer_tpu.engines import video as video_engine
    from styletransfer_tpu.utils import images as img_utils

    params = transformer.init_params(jax.random.PRNGKey(0), in_channels=6)
    streams = [f"S{i}" for i in range(10)]
    frames = {}
    for sname in streams:
        for t in range(2 if sname in ("S0", "S9") else 1):
            arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
            p = tmp_path / f"{sname}_{t}.png"
            Image.fromarray(arr).save(p)
            frames[(sname, t)] = p

    order = [(s, 0) for s in streams] + [("S0", 1), ("S9", 1)]
    outs = {k: tmp_path / f"out_{k[0]}_{k[1]}.png" for k in order}
    stdin = io.StringIO(
        "".join(f"{frames[k]}\t{outs[k]}\t{k[0]}\n" for k in order) + "\n"
    )
    stdout = io.StringIO()
    n = video_engine.serve_stream_loop(
        style_name="tst", out_dir=str(tmp_path / "results"), params=params,
        size=32, batch_size=2, max_streams=12, stdin=stdin, stdout=stdout,
    )
    assert n == len(order)
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "READY"
    for line, k in zip(lines[1:], order):
        assert line == f"OK {outs[k]}"

    for sname in ("S0", "S9"):
        u8 = jnp.asarray(np.stack([
            img_utils.load_image_uint8(str(frames[(sname, t)]), size=32)[0]
            for t in range(2)
        ]))[:, None]
        ref = video_engine._stylize_chunk(
            params, u8, img_utils.maybe_normalize_on_device(u8[0])
        )
        want = np.asarray(img_utils.to_uint8_on_device(ref))[:, 0]
        for t in range(2):
            got = np.asarray(Image.open(outs[(sname, t)]))
            np.testing.assert_array_equal(got, want[t])


def test_video_serve_batched_stress_interleaved_streams(tmp_path, rng):
    """12 requests across 3 ragged-length interleaved streams through a
    batch-4 daemon: one response per request in order, and every stream's
    outputs stay bit-identical to its scanned single-stream reference —
    however the burst happens to group into waves."""
    import io

    from PIL import Image

    from styletransfer_tpu.engines import video as video_engine
    from styletransfer_tpu.utils import images as img_utils

    params = transformer.init_params(jax.random.PRNGKey(0), in_channels=6)
    lengths = {"A": 5, "B": 3, "C": 4}
    frames = {}
    for sname, n in lengths.items():
        for t in range(n):
            arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
            p = tmp_path / f"{sname}{t}.png"
            Image.fromarray(arr).save(p)
            frames[(sname, t)] = p

    # Round-robin interleave: A0 B0 C0 A1 B1 C1 ...
    order = []
    for t in range(max(lengths.values())):
        for sname, n in lengths.items():
            if t < n:
                order.append((sname, t))
    outs = {k: tmp_path / f"out_{k[0]}{k[1]}.png" for k in order}
    stdin = io.StringIO(
        "".join(f"{frames[k]}\t{outs[k]}\t{k[0]}\n" for k in order) + "\n"
    )
    stdout = io.StringIO()
    n = video_engine.serve_stream_loop(
        style_name="tst", out_dir=str(tmp_path / "results"), params=params,
        size=32, batch_size=4, stdin=stdin, stdout=stdout,
    )
    assert n == len(order)
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "READY" and len(lines) == 1 + len(order)
    # Responses in request order: the k-th line names the k-th output.
    for line, k in zip(lines[1:], order):
        assert line == f"OK {outs[k]}"

    for sname, count in lengths.items():
        u8 = jnp.asarray(np.stack([
            img_utils.load_image_uint8(str(frames[(sname, t)]), size=32)[0]
            for t in range(count)
        ]))[:, None]
        ref = video_engine._stylize_chunk(
            params, u8, img_utils.maybe_normalize_on_device(u8[0])
        )
        want = np.asarray(img_utils.to_uint8_on_device(ref))[:, 0]
        for t in range(count):
            got = np.asarray(Image.open(outs[(sname, t)]))
            # Different program shapes ([4,...] waves vs the scanned
            # reference) can round differently at the uint8 quantize
            # boundary; anything beyond one level would mean a stream
            # got the wrong carry.
            assert np.abs(got.astype(np.int16) - want[t]).max() <= 1


def test_video_serve_batched_bare_reset_is_a_barrier(tmp_path, rng):
    """A bare RESET inside a batched burst must also reset streams whose
    frames preceded it in the SAME group: waves serialize around it, so
    the frame before it advances its carry first and the frame after it
    starts fresh."""
    import io

    from PIL import Image

    from styletransfer_tpu.engines import video as video_engine
    from styletransfer_tpu.utils import images as img_utils

    params = transformer.init_params(jax.random.PRNGKey(0), in_channels=6)
    a0, a1 = tmp_path / "a0.png", tmp_path / "a1.png"
    for p in (a0, a1):
        Image.fromarray(
            rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        ).save(p)
    o1, o2 = tmp_path / "o1.png", tmp_path / "o2.png"

    stdin = io.StringIO(
        f"{a0}\t{o1}\tA\n"
        "RESET\n"
        f"{a1}\t{o2}\tA\n"
        "\n"
    )
    stdout = io.StringIO()
    video_engine.serve_stream_loop(
        style_name="tst", out_dir=str(tmp_path / "results"), params=params,
        size=32, batch_size=2, stdin=stdin, stdout=stdout,
    )
    lines = stdout.getvalue().splitlines()
    assert [l.split()[0] for l in lines[1:]] == ["OK", "OK", "OK"]

    # a1 must match a FRESH single-frame stream (pairs with itself), not a
    # continuation of a0's carry.
    u8 = jnp.asarray(
        img_utils.load_image_uint8(str(a1), size=32)
    )[None]
    fresh = video_engine._stylize_chunk(
        params, u8, img_utils.maybe_normalize_on_device(u8[0])
    )
    want = np.asarray(img_utils.to_uint8_on_device(fresh))[0, 0]
    np.testing.assert_array_equal(np.asarray(Image.open(o2)), want)


def test_gatys_serve_batched_lone_survivor_uses_single_lane(
    tmp_path, rng, vgg_params, monkeypatch
):
    """When parse/load failures leave ONE surviving lane in a group, it
    must route through the single-lane program (padding one lane to the
    full compiled batch costs ~batch x one image under the contract
    optimizer). Guarded by making the batched program unreachable."""
    import io

    from PIL import Image

    content = tmp_path / "c.png"
    style = tmp_path / "s.png"
    for p in (content, style):
        Image.fromarray(
            rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        ).save(p)

    real = gatys._run_serve_batched
    calls = {"n": 0}

    def guard(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] > 1:  # call 1 is the daemon's warm-up compile
            raise AssertionError("batched program must not run for one lane")
        return real(*args, **kwargs)

    monkeypatch.setattr(gatys, "_run_serve_batched", guard)

    stdin = io.StringIO(
        f"{tmp_path}/missing.png\t{style}\n"   # fails to load
        f"{content}\t{style}\n"                # the lone survivor
        "\n"
    )
    stdout = io.StringIO()
    gatys.serve_loop(
        steps=2, optimizer="adam", size=32, batch=2,
        out_dir=str(tmp_path / "results"),
        vgg_params=vgg_params, stdin=stdin, stdout=stdout,
    )
    lines = stdout.getvalue().splitlines()
    oks = [l for l in lines[1:] if l.startswith("OK ")]
    errs = [l for l in lines[1:] if l.startswith("ERR ")]
    assert len(oks) == 1 and len(errs) == 1
    assert os.path.isfile(oks[0].split(" ")[1])


def test_video_serve_stream_matches_scan(tmp_path, rng):
    """video_st serve: frame-by-frame streaming with a persistent carry is
    bit-identical to the scanned clip stylizer, and RESET starts a fresh
    stream (next frame pairs with itself)."""
    import io

    from PIL import Image

    from styletransfer_tpu.engines import video as video_engine
    from styletransfer_tpu.utils import images as img_utils

    params = transformer.init_params(jax.random.PRNGKey(0), in_channels=6)
    paths = []
    for i in range(3):
        arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        p = tmp_path / f"f{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(p)

    stdin = io.StringIO(
        f"{paths[0]}\n{paths[1]}\nRESET\n{paths[2]}\n\n"
    )
    stdout = io.StringIO()
    n = video_engine.serve_stream_loop(
        style_name="tst", out_dir=str(tmp_path / "results"), params=params,
        size=32, stdin=stdin, stdout=stdout,
    )
    assert n == 3
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "READY"
    assert [l.split()[0] for l in lines[1:]] == ["OK", "OK", "OK", "OK"]
    assert lines[3] == "OK RESET"

    # Scanned-reference for the first stream (frames 0,1):
    frames_u8 = jnp.asarray(np.stack(
        [img_utils.load_image_uint8(str(p), size=32)[0] for p in paths[:2]]
    ))[:, None]  # [T,1,32,32,3]
    carry0 = img_utils.maybe_normalize_on_device(frames_u8[0])
    outs = video_engine._stylize_chunk(params, frames_u8, carry0)
    want = np.asarray(img_utils.to_uint8_on_device(outs))[:, 0]
    for t in (0, 1):
        got = np.asarray(Image.open(lines[1 + t].split(" ", 1)[1]))
        np.testing.assert_array_equal(got, want[t])

    # After RESET, frame 2 must match a fresh single-frame stream, NOT a
    # continuation of the old carry.
    f2 = jnp.asarray(
        img_utils.load_image_uint8(str(paths[2]), size=32)
    )[None]  # [1,1,32,32,3]
    out2 = video_engine._stylize_chunk(
        params, f2, img_utils.maybe_normalize_on_device(f2[0])
    )
    want2 = np.asarray(img_utils.to_uint8_on_device(out2))[0, 0]
    got2 = np.asarray(Image.open(lines[4].split(" ", 1)[1]))
    np.testing.assert_array_equal(got2, want2)


def test_daemon_stats_device_rtt_field(monkeypatch):
    """Every daemon's STATS reply carries device_rtt_ms (a 1-element
    device round-trip — transport attribution in production); the field
    is a parseable float, disabled cleanly by STX_STATS_RTT=0, and must
    never break STATS when the probe fails."""
    import io

    from styletransfer_tpu.engines import daemon

    stdin = io.StringIO("a\nSTATS\n\n")
    stdout = io.StringIO()
    daemon.run_request_loop(lambda *f: f[0], stdin=stdin, stdout=stdout,
                            name="t")
    stats_line = stdout.getvalue().splitlines()[1]
    assert "device_rtt_ms=" in stats_line
    kv = dict(tok.split("=", 1) for tok in stats_line.split()[2:])
    assert float(kv["device_rtt_ms"]) > 0.0

    # Batched loop: same field on in-burst STATS answers.
    stdin = io.StringIO("a\nSTATS\n\n")
    stdout = io.StringIO()
    daemon.run_batched_request_loop(
        lambda reqs: [f[0] for f in reqs], max_batch=1,
        stdin=stdin, stdout=stdout, name="t",
    )
    stats_line = next(l for l in stdout.getvalue().splitlines()
                      if l.startswith("OK STATS"))
    assert "device_rtt_ms=" in stats_line

    # Opt-out.
    monkeypatch.setenv("STX_STATS_RTT", "0")
    stdin = io.StringIO("STATS\n\n")
    stdout = io.StringIO()
    daemon.run_request_loop(lambda *f: f[0], stdin=stdin, stdout=stdout,
                            name="t")
    assert "device_rtt_ms" not in stdout.getvalue()

    # Probe failure degrades to an absent field, never an ERR.
    monkeypatch.delenv("STX_STATS_RTT", raising=False)
    monkeypatch.setitem(daemon._rtt_state, "fn", None)

    def boom(*a, **k):
        raise RuntimeError("no backend")

    monkeypatch.setattr(daemon, "device_rtt_ms", lambda: None)
    stdin = io.StringIO("STATS\n\n")
    stdout = io.StringIO()
    daemon.run_request_loop(lambda *f: f[0], stdin=stdin, stdout=stdout,
                            name="t")
    out = stdout.getvalue()
    assert out.startswith("OK STATS") and "device_rtt_ms" not in out


def test_blend_weight_validation_rejects_nonfinite():
    """NaN/inf blend weights compare False against every bound, so they
    previously slipped through the <=0 / <0 checks and burned a full
    optimization on all-NaN Gram targets. Both parsers must reject them
    up front."""
    from styletransfer_tpu.engines import gatys, multistyle

    for bad in ("a.png,b.png:nan,1", "a.png,b.png:inf,1",
                "a.png,b.png:1,-inf"):
        with pytest.raises(ValueError, match="finite"):
            gatys.parse_style_spec(bad)
    # Sane specs still parse.
    paths, ws = gatys.parse_style_spec("a.png,b.png:1,3")
    assert paths == ["a.png", "b.png"] and ws == [0.25, 0.75]

    parse = multistyle._make_style_parser(2)
    for bad in ("nan,1", "inf,1", "1,-inf"):
        with pytest.raises(ValueError, match="finite"):
            parse(bad)
    w, tag = parse("1,3")
    np.testing.assert_allclose(w, [0.25, 0.75])
