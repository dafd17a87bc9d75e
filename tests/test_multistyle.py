"""Tests for the multi-style (conditional instance norm) extension."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styletransfer_tpu.engines import multistyle as ms_engine
from styletransfer_tpu.models import multistyle, transformer, vgg

SIZE = 16
S = 3  # styles


@pytest.fixture(scope="module")
def vgg_params():
    return vgg.init_params(jax.random.PRNGKey(0))


def test_param_shapes():
    params = multistyle.init_params(jax.random.PRNGKey(0), num_styles=S)
    assert multistyle.num_styles(params) == S
    assert params["in1"]["scale"].shape == (S, 32)
    assert params["res2"]["in2"]["bias"].shape == (S, 128)
    # conv weights unchanged (shared across styles)
    assert params["conv1"]["kernel"].shape == (9, 9, 3, 32)


def test_style_selection_matches_single_style_net():
    """With embeddings copied from a single-style net, every style index
    must reproduce that net's output exactly."""
    single = transformer.init_params(jax.random.PRNGKey(1))
    params = multistyle.init_params(jax.random.PRNGKey(1), num_styles=S)

    x = jax.random.normal(jax.random.PRNGKey(2), (2, SIZE, SIZE, 3)) * 0.5
    ref = np.asarray(transformer.apply(single, x, use_pallas=False))
    for s in range(S):
        out = np.asarray(
            multistyle.apply(params, x, jnp.full((2,), s, jnp.int32))
        )
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_different_styles_give_different_outputs():
    params = multistyle.init_params(jax.random.PRNGKey(0), num_styles=S)
    # Perturb style 1's embeddings.
    params["in1"]["scale"] = params["in1"]["scale"].at[1].mul(2.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3)) * 0.5
    out0 = np.asarray(multistyle.apply(params, x, jnp.array([0])))
    out1 = np.asarray(multistyle.apply(params, x, jnp.array([1])))
    assert not np.allclose(out0, out1)


def test_mixed_batch_equals_per_style_calls():
    params = multistyle.init_params(jax.random.PRNGKey(0), num_styles=S)
    params["in2"]["bias"] = params["in2"]["bias"].at[2].add(0.5)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, SIZE, SIZE, 3)) * 0.5
    mixed = np.asarray(multistyle.apply(params, x, jnp.array([0, 2])))
    solo0 = np.asarray(multistyle.apply(params, x[:1], jnp.array([0])))
    solo2 = np.asarray(multistyle.apply(params, x[1:], jnp.array([2])))
    np.testing.assert_allclose(mixed[0], solo0[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mixed[1], solo2[0], rtol=1e-5, atol=1e-6)


def test_blend_endpoints_match_hard_selection():
    params = multistyle.init_params(jax.random.PRNGKey(0), num_styles=2)
    params["in3"]["scale"] = params["in3"]["scale"].at[1].mul(1.5)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, SIZE, SIZE, 3)) * 0.5
    hard = np.asarray(multistyle.apply(params, x, jnp.array([1])))
    blend = np.asarray(
        multistyle.apply_blend(params, x, jnp.array([[0.0, 1.0]]))
    )
    np.testing.assert_allclose(blend, hard, rtol=1e-5, atol=1e-6)
    # A 50/50 blend is neither endpoint.
    mid = np.asarray(multistyle.apply_blend(params, x, jnp.array([[0.5, 0.5]])))
    assert not np.allclose(mid, hard)


def test_multistyle_training_step(vgg_params):
    styles = jax.random.normal(jax.random.PRNGKey(5), (S, SIZE, SIZE, 3)) * 0.5
    grams = ms_engine.stack_style_grams(vgg_params, styles)
    assert grams["Conv2d_1"].shape[0] == S

    params = multistyle.init_params(jax.random.PRNGKey(0), num_styles=S)
    opt, step = ms_engine.make_train_step(vgg_params, grams, style_weight=1000.0)
    opt_state = opt.init(params)

    batch = jax.random.normal(jax.random.PRNGKey(6), (4, SIZE, SIZE, 3)) * 0.5
    idx = jnp.array([0, 1, 2, 0])
    emb_before = np.asarray(params["in1"]["scale"]).copy()
    params, opt_state, metrics = step(params, opt_state, batch, idx)
    assert np.isfinite(float(metrics["total"]))
    emb_after = np.asarray(params["in1"]["scale"])
    # Styles present in the batch trained; conv weights also updated.
    assert not np.allclose(emb_after[0], emb_before[0])
    assert not np.allclose(emb_after[1], emb_before[1])


def test_unused_style_embedding_gets_no_gradient(vgg_params):
    styles = jax.random.normal(jax.random.PRNGKey(5), (S, SIZE, SIZE, 3)) * 0.5
    grams = ms_engine.stack_style_grams(vgg_params, styles)
    params = multistyle.init_params(jax.random.PRNGKey(0), num_styles=S)

    def loss(p):
        total, _ = ms_engine.multistyle_loss(
            p, jax.random.normal(jax.random.PRNGKey(6), (2, SIZE, SIZE, 3)),
            jnp.array([0, 1]), vgg_params, grams, 1000.0, 1.0,
        )
        return total

    g = jax.grad(loss)(params)
    # Style 2 never selected -> zero gradient on its embeddings.
    np.testing.assert_allclose(np.asarray(g["in1"]["scale"][2]), 0.0)
    assert float(np.abs(np.asarray(g["in1"]["scale"][0])).max()) > 0


def test_multistyle_train_and_convert_cli(tmp_path, monkeypatch, vgg_params):
    """End-to-end: engine train (tiny) -> convert-image-multi CLI (index + blend)."""
    from click.testing import CliRunner
    from PIL import Image as PILImage

    from styletransfer_tpu import constants
    from styletransfer_tpu.clis import cli
    from styletransfer_tpu.data import coco as coco_data

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))

    styles = jax.random.normal(jax.random.PRNGKey(5), (2, SIZE, SIZE, 3)) * 0.5
    loader = coco_data.DataLoader(coco_data.SyntheticDataset(8, SIZE), batch_size=4)
    test_loader = coco_data.DataLoader(
        coco_data.SyntheticDataset(4, SIZE), batch_size=4
    )
    ms_engine.train(
        styles, style_name="duo", epochs=1, batch_size=4,
        vgg_params=vgg_params, train_loader=loader, test_loader=test_loader,
        runs_dir=str(tmp_path / "runs" / "multi_duo"),
        models_path=str(tmp_path / "data" / "models"), max_steps_per_epoch=2,
        step_checkpoint_every=1,
    )

    # House-standard training contract (same as static_train): TB events
    # written, mid-epoch step state saved alongside the epoch checkpoint.
    event_files = list((tmp_path / "runs" / "multi_duo").glob("events.out.tfevents.*"))
    assert event_files and event_files[0].stat().st_size > 0
    assert (
        tmp_path / "data" / "models" / "fast_multi_st_duo_step_state.msgpack"
    ).exists()

    rng = np.random.default_rng(0)
    PILImage.fromarray(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    ).save(tmp_path / "photo.png")

    runner = CliRunner()
    r1 = runner.invoke(cli, [
        "fast_st", "convert-image-multi", "photo.png", "duo",
        "--style-index", "1", "--num-styles", "2",
    ])
    assert r1.exit_code == 0, r1.output + repr(r1.exception)
    r2 = runner.invoke(cli, [
        "fast_st", "convert-image-multi", "photo.png", "duo",
        "--blend", "0.3,0.7", "--num-styles", "2",
    ])
    assert r2.exit_code == 0, r2.output + repr(r2.exception)
    results = sorted((tmp_path / "results").iterdir())
    assert [p.name for p in results] == [
        "converted_fast_multi_st_duo_blend.png",
        "converted_fast_multi_st_duo_style1.png",
    ]


def test_multistyle_serve_loop_protocol(tmp_path, rng):
    """serve-multi daemon: per-request hard index and blend weights from one
    compiled program; invalid style specs answer ERR without killing it;
    one-hot blend == hard selection == the convert path's output."""
    import io
    import os

    from PIL import Image

    from styletransfer_tpu.utils import images as img_utils

    params = multistyle.init_params(jax.random.PRNGKey(0), num_styles=S)
    # Make styles genuinely distinct so selection is observable.
    params["in1"]["scale"] = params["in1"]["scale"].at[1].mul(3.0)

    img = tmp_path / "photo.png"
    arr = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    Image.fromarray(arr).save(img)

    stdin = io.StringIO(
        f"{img}\n"                         # default style 0
        f"{img}\t\t1\n"                    # hard index 1, default naming
        f"{img}\t{tmp_path}/blend.png\t1,1,2\n"  # blend, explicit output
        f"{img}\t\t7\n"                    # out-of-range index -> ERR
        f"{img}\t\t0.5,0.5\n"              # wrong weight count -> ERR
        f"{img}\ta\tb\tc\td\n"             # too many fields -> clean ERR
        "\n"
    )
    stdout = io.StringIO()
    n = ms_engine.serve_loop(
        name="tst", num_styles=S, out_dir=str(tmp_path / "results"),
        params=params, size=32, stdin=stdin, stdout=stdout,
    )
    assert n == 3
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "READY"
    assert [l.split()[0] for l in lines[1:]] == [
        "OK", "OK", "OK", "ERR", "ERR", "ERR"
    ]
    assert "out of range" in lines[4]
    assert "blend weights" in lines[5]
    # Serial mode answers the SAME clean field-count error as batched mode,
    # not a leaked TypeError from handle(*fields).
    assert ("expected INPUT[\\tOUTPUT[\\tSTYLE[\\tSIZE]]], got 5 fields"
            in lines[6])

    # Daemon's hard-index output == direct apply through the same uint8 path
    # (the daemon evaluates every request as a blend; a one-hot blend equals
    # hard selection up to f32 reassociation, so allow 1 uint8 count).
    u8 = jnp.asarray(img_utils.load_image_uint8(str(img), size=32))
    for line, idx in ((lines[1], 0), (lines[2], 1)):
        x = img_utils.maybe_normalize_on_device(u8)
        want = np.asarray(img_utils.to_uint8_on_device(
            multistyle.apply(params, x, jnp.array([idx]))
        ))[0]
        got = np.asarray(Image.open(line.split(" ", 1)[1]))
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    # Styles 0 and 1 actually differ.
    a = np.asarray(Image.open(lines[1].split(" ", 1)[1])).astype(int)
    b = np.asarray(Image.open(lines[2].split(" ", 1)[1])).astype(int)
    assert np.abs(a - b).max() > 0


def test_multistyle_serve_loop_batched_mixed_styles(tmp_path, rng):
    """serve-multi -b N: a group mixing hard indices and blends runs as one
    device call (styles are per-sample data); responses keep request order
    and match the unbatched daemon within 1 uint8 count (different batch
    sizes compile different XLA tilings, which can reassociate f32
    accumulation at a round-half boundary)."""
    import io

    from PIL import Image

    params = multistyle.init_params(jax.random.PRNGKey(0), num_styles=S)
    params["in1"]["scale"] = params["in1"]["scale"].at[1].mul(3.0)
    img = tmp_path / "photo.png"
    Image.fromarray(
        rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    ).save(img)

    reqs = (
        f"{img}\t{tmp_path}/b0.png\t0\n"
        f"{img}\t{tmp_path}/b1.png\t1\n"
        f"{img}\t{tmp_path}/bb.png\t1,1,2\n"
        f"{img}\t\t9\n"  # out of range -> ERR, in order
        "\n"
    )
    stdout = io.StringIO()
    n = ms_engine.serve_loop(
        name="tst", num_styles=S, out_dir=str(tmp_path / "results"),
        params=params, size=32, batch_size=4,
        stdin=io.StringIO(reqs), stdout=stdout,
    )
    assert n == 3
    lines = stdout.getvalue().splitlines()
    assert lines[0] == "READY"
    assert [l.split()[0] for l in lines[1:]] == ["OK", "OK", "OK", "ERR"]

    # Matches the unbatched daemon within 1 uint8 count (see docstring).
    reqs1 = (
        f"{img}\t{tmp_path}/s0.png\t0\n"
        f"{img}\t{tmp_path}/s1.png\t1\n"
        f"{img}\t{tmp_path}/sb.png\t1,1,2\n"
        "\n"
    )
    ms_engine.serve_loop(
        name="tst", num_styles=S, out_dir=str(tmp_path / "results"),
        params=params, size=32, batch_size=1,
        stdin=io.StringIO(reqs1), stdout=io.StringIO(),
    )
    for b, s in (("b0", "s0"), ("b1", "s1"), ("bb", "sb")):
        got = np.asarray(Image.open(tmp_path / f"{b}.png")).astype(int)
        want = np.asarray(Image.open(tmp_path / f"{s}.png")).astype(int)
        assert np.abs(got - want).max() <= 1


def test_multistyle_serve_loop_size_buckets(tmp_path, rng):
    """serve-multi with --sizes: the optional fourth field routes each
    request to a compiled resolution bucket while styles keep mixing as
    data; un-compiled sizes answer ERR; serial == batched behavior."""
    import io

    from PIL import Image

    params = multistyle.init_params(jax.random.PRNGKey(0), num_styles=S)
    img = tmp_path / "photo.png"
    Image.fromarray(
        rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    ).save(img)

    requests = (
        f"{img}\t{tmp_path}/d.png\t1\n"          # default bucket (32)
        f"{img}\t{tmp_path}/big.png\t1,1,2\t48\n"  # blend in the 48 bucket
        f"{img}\t{tmp_path}/x.png\t0\t40\n"      # not a bucket -> ERR
        "\n"
    )
    for batch_size in (1, 3):
        stdin = io.StringIO(requests)
        stdout = io.StringIO()
        n = ms_engine.serve_loop(
            name="tst", num_styles=S, out_dir=str(tmp_path / "results"),
            params=params, sizes=[32, 48], batch_size=batch_size,
            stdin=stdin, stdout=stdout,
        )
        assert n == 2
        lines = stdout.getvalue().splitlines()
        assert lines[0] == "READY"
        assert lines[1] == f"OK {tmp_path}/d.png"
        assert lines[2] == f"OK {tmp_path}/big.png"
        assert "size 40 not in serving buckets [32, 48]" in lines[3]
        assert Image.open(tmp_path / "d.png").size == (32, 32)
        assert Image.open(tmp_path / "big.png").size == (48, 48)
