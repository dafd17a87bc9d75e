"""CLI contract tests: groups/commands/options match the reference
(`python -m stransfer <group> <task>` — reference clis/*)."""

import numpy as np
from click.testing import CliRunner
from PIL import Image

from styletransfer_tpu.clis import cli


def test_cli_groups_registered():
    # The reference's three groups exactly (its whole CLI surface), plus
    # the framework-added doctor diagnostics command.
    assert set(cli.commands) == {"gatys_st", "fast_st", "video_st", "doctor"}


def test_gatys_options_match_reference():
    params = {p.name for p in cli.commands["gatys_st"].params}
    # reference clis/gatys_st.py:11-18
    assert {"content_image_path", "style_image_path", "out_name", "steps",
            "content_weight", "style_weight"} <= params
    defaults = {p.name: p.default for p in cli.commands["gatys_st"].params}
    assert defaults["steps"] == 300
    assert defaults["style_weight"] == 100_000
    assert defaults["content_weight"] == 1
    assert defaults["out_name"] == "gatys_converted.png"
    # The reference CLI has no optimizer flag: train_gatys runs L-BFGS
    # (network.py:435), so the CLI default must be lbfgs for output parity.
    assert defaults["optimizer"] == "lbfgs"


def test_cli_docs_are_generated_and_fresh():
    """docs/terminal_interface.md must be the output of scripts/gen_cli_docs.py
    — the docs-can't-drift contract (the reference used sphinx-click,
    /root/reference/docs/terminal_interface.rst:4-6)."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_cli_docs", os.path.join(repo, "scripts", "gen_cli_docs.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open(os.path.join(repo, "docs", "terminal_interface.md")) as f:
        on_disk = f.read()
    assert on_disk == mod.render(), (
        "docs/terminal_interface.md is stale — run: python scripts/gen_cli_docs.py"
    )


def test_gatys_engine_defaults_match_reference_method():
    """Engine defaults are the reference METHOD defaults (network.py:413,
    435): steps=550 and L-BFGS; the CLI layer passes steps=300 (reference
    clis/gatys_st.py:14)."""
    import inspect

    from styletransfer_tpu.engines import gatys

    sig = inspect.signature(gatys.train_gatys)
    assert sig.parameters["steps"].default == 550
    assert sig.parameters["optimizer"].default == "lbfgs"


def test_fast_st_subcommands_and_defaults():
    fast = cli.commands["fast_st"]
    assert {"train", "convert-image"} <= set(fast.commands)
    defaults = {p.name: p.default for p in fast.commands["train"].params}
    # reference clis/fast_st.py:19-25
    assert defaults["epochs"] == 50
    assert defaults["batch_size"] == 4
    assert defaults["style_weight"] == 100_000


def test_video_st_subcommands_and_defaults():
    video = cli.commands["video_st"]
    assert set(video.commands) == {"train", "convert-video", "convert-dir", "serve"}
    defaults = {p.name: p.default for p in video.commands["train"].params}
    # reference clis/video_st.py:19-30
    assert defaults["temporal_weight"] == 0.8
    assert defaults["use_pretrained_fast_st"] is False
    cv_defaults = {p.name: p.default for p in video.commands["convert-video"].params}
    assert cv_defaults["fps"] == 24.0


def test_help_runs():
    runner = CliRunner()
    for args in ([], ["gatys_st", "--help"], ["fast_st", "--help"],
                 ["video_st", "--help"]):
        result = runner.invoke(cli, args + (["--help"] if not args else []))
        assert result.exit_code == 0


def test_gatys_end_to_end_tiny(tmp_path, monkeypatch):
    """Full CLI run: 2 steps of Gatys on tiny images, output file written."""
    from styletransfer_tpu import constants

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))
    rng = np.random.default_rng(0)
    for name in ("content.png", "style.png"):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / name)

    runner = CliRunner()
    result = runner.invoke(
        cli, ["gatys_st", "content.png", "style.png", "-s", "2", "-n", "out.png"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert (tmp_path / "results" / "out.png").is_file()


def test_gatys_coarse_to_fine_cli(tmp_path, monkeypatch):
    """--coarse-steps end to end (writes the output), and --serve
    rejects it with a usage error (one compiled program per daemon)."""
    from styletransfer_tpu import constants

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))
    rng = np.random.default_rng(0)
    for name in ("content.png", "style.png"):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / name)

    runner = CliRunner()
    result = runner.invoke(
        cli, ["gatys_st", "content.png", "style.png", "-s", "2",
              "-n", "out.png", "--optimizer", "adam",
              "--coarse-steps", "2", "--coarse-scale", "0.5"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    assert (tmp_path / "results" / "out.png").is_file()

    result = runner.invoke(
        cli, ["gatys_st", "--serve", "--coarse-steps", "2"]
    )
    assert result.exit_code != 0
    assert "--coarse-steps is not supported in --serve" in result.output


def test_gatys_style_blend_cli(tmp_path, monkeypatch):
    """One-shot STYLE-IMAGE-PATH blend spec: full weight on one style is
    bit-identical to the plain run; bad specs are usage errors."""
    from styletransfer_tpu import constants

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))
    rng = np.random.default_rng(0)
    for name in ("content.png", "s1.png", "s2.png"):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / name)

    runner = CliRunner()
    base = ["gatys_st", "content.png", "-s", "2", "--optimizer", "adam"]
    r1 = runner.invoke(cli, base[:2] + ["s1.png"] + base[2:] + ["-n", "p.png"])
    r2 = runner.invoke(
        cli, base[:2] + ["s1.png,s2.png:1,0"] + base[2:] + ["-n", "b.png"])
    assert r1.exit_code == 0, r1.output + repr(r1.exception)
    assert r2.exit_code == 0, r2.output + repr(r2.exception)
    plain = np.asarray(Image.open(tmp_path / "results" / "p.png"))
    blend = np.asarray(Image.open(tmp_path / "results" / "b.png"))
    np.testing.assert_array_equal(plain, blend)

    r3 = runner.invoke(
        cli, base[:2] + ["s1.png,s2.png:0.3"] + base[2:])
    assert r3.exit_code != 0
    assert "2 style paths but 1 weights" in r3.output


def test_gatys_batched_directory_cli(tmp_path, monkeypatch):
    """CONTENT-IMAGE-PATH as a directory: one batched optimization, one
    output per input image with the stem appended."""
    from styletransfer_tpu import constants

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))
    rng = np.random.default_rng(0)
    (tmp_path / "contents").mkdir()
    for name in ("a.png", "b.png"):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / "contents" / name)
    Image.fromarray(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    ).save(tmp_path / "style.png")

    runner = CliRunner()
    result = runner.invoke(
        cli, ["gatys_st", "contents", "style.png", "-s", "2", "-n", "out.png",
              "--optimizer", "adam"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    names = sorted(p.name for p in (tmp_path / "results").iterdir())
    assert names == ["out_a.png", "out_b.png"]


def test_pack_dataset_cli(tmp_path, monkeypatch, rng):
    from styletransfer_tpu import constants
    from styletransfer_tpu.data.packed import PackedDataset

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"{i}.png")

    runner = CliRunner()
    result = runner.invoke(
        cli, ["fast_st", "pack-dataset", "imgs", "out.bin", "--size", "16"]
    )
    assert result.exit_code == 0, result.output + repr(result.exception)
    ds = PackedDataset(str(tmp_path / "out.bin"))
    assert len(ds) == 3 and ds.load(0).shape == (16, 16, 3)


def test_gatys_history_size_mode_defaults(monkeypatch):
    """--history-size defaults are mode-dependent (measured decision,
    docs/performance.md round 5): one-shot = torch's H=100 contract,
    --serve = H=16; an explicit value overrides either mode."""
    from click.testing import CliRunner

    from styletransfer_tpu.clis import cli
    from styletransfer_tpu.engines import gatys as gatys_engine, httpserve

    seen = {}

    def fake_transport(run, tcp, http, name, prog):
        seen["transport"] = True
        # run() would start the daemon loop; don't.

    def fake_serve_loop(**kwargs):
        seen.update(kwargs)
        return 0

    monkeypatch.setattr(gatys_engine, "serve_loop", fake_serve_loop)
    monkeypatch.setattr(
        httpserve, "serve_transport",
        lambda run, tcp, http, name, prog: run(None, None),
    )
    r = CliRunner().invoke(cli, ["gatys_st", "--serve"])
    assert r.exit_code == 0, r.output
    assert seen["history_size"] == 16

    seen.clear()
    monkeypatch.setattr(gatys_engine, "serve_loop", fake_serve_loop)
    r = CliRunner().invoke(cli, ["gatys_st", "--serve",
                                 "--history-size", "100"])
    assert r.exit_code == 0, r.output
    assert seen["history_size"] == 100

    # One-shot: capture train_gatys's kwargs without running it.
    def fake_train(vgg_params, **kwargs):
        seen.update(kwargs)
        import jax.numpy as jnp

        return jnp.zeros((1, 8, 8, 3)), [0.0]

    seen.clear()
    monkeypatch.setattr(gatys_engine, "train_gatys", fake_train)
    from styletransfer_tpu.utils import demo

    assets = demo.ensure_demo_assets()
    r = CliRunner().invoke(
        cli, ["gatys_st", assets["content"], assets["style"], "-s", "1"]
    )
    assert r.exit_code == 0, r.output
    assert seen["history_size"] == 100
