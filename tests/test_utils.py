"""Tests for misc infra: compile cache config, logging, downloads offline."""

import logging
import os

from styletransfer_tpu.utils import cache
from styletransfer_tpu.utils.logging import TqdmLoggingHandler, get_logger


def test_persistent_cache_configured():
    # Package import enables it (conftest imported the package already).
    import jax

    cache.enable_persistent_cache()
    assert jax.config.jax_compilation_cache_dir  # non-empty path


def test_matmul_precision_env_knob(monkeypatch):
    """STX_MATMUL_PRECISION configures jax_default_matmul_precision at
    import/apply time; invalid values are ignored with a warning."""
    import jax

    original = jax.config.jax_default_matmul_precision
    try:
        monkeypatch.setenv("STX_MATMUL_PRECISION", "highest")
        cache.apply_matmul_precision()
        assert jax.config.jax_default_matmul_precision == "highest"

        monkeypatch.setenv("STX_MATMUL_PRECISION", "bogus")
        cache.apply_matmul_precision()  # must not raise
        assert jax.config.jax_default_matmul_precision == "highest"

        monkeypatch.delenv("STX_MATMUL_PRECISION")
        cache.apply_matmul_precision()  # unset -> no change
        assert jax.config.jax_default_matmul_precision == "highest"
    finally:
        jax.config.update("jax_default_matmul_precision", original)


def test_platform_env_knob_forces_cpu_backend():
    """STX_PLATFORM=cpu forces the CPU backend through the jax_platforms
    config update at package import — the deliberate CPU-only mode for CI
    hosts and accelerator-tunnel outages (plugin backends that register
    unconditionally ignore the JAX_PLATFORMS environment variable, but
    honor the config update; utils/cache.py:apply_platform)."""
    import subprocess
    import sys

    env = dict(os.environ, STX_PLATFORM="cpu")
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c",
         "import styletransfer_tpu, jax; print(jax.devices())"],
        capture_output=True, text=True, timeout=180, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "cpu" in out.stdout.lower()


def test_console_logs_go_to_stderr_not_stdout(capsys):
    """The serving daemons' stdout carries a one-line-per-request protocol;
    console log lines must never interleave with it (engines/daemon.py)."""
    logger = get_logger()
    logger.warning("daemon-protocol-check %d", 7)
    cap = capsys.readouterr()
    assert "daemon-protocol-check 7" in cap.err
    assert "daemon-protocol-check" not in cap.out


def test_logger_singleton_and_handlers():
    a = get_logger()
    b = get_logger()
    assert a is b
    assert a.name == "StyleTransfer"
    assert any(isinstance(h, TqdmLoggingHandler) for h in a.handlers)
    assert a.level == logging.INFO


def test_logger_emits_through_tqdm(capsys):
    logger = get_logger()
    logger.info("hello from test %d", 42)
    captured = capsys.readouterr()
    assert "hello from test 42" in captured.out + captured.err


def test_download_coco_missing_manifest_is_noop(tmp_path, monkeypatch):
    from styletransfer_tpu import constants
    from styletransfer_tpu.data import download

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))
    # No manifest -> logs and returns without network access.
    download.download_coco_images()
    assert os.path.isdir(tmp_path / "data" / "coco_dataset" / "images")


def test_download_videos_offline_graceful(tmp_path, monkeypatch):
    from styletransfer_tpu import constants
    from styletransfer_tpu.data import download

    monkeypatch.setattr(constants, "PROJECT_ROOT_PATH", str(tmp_path))
    # Zero-egress: must warn and return, not raise.
    download.download_videos_dataset()
    assert os.path.isdir(tmp_path / "data" / "video")


def test_demo_assets_deterministic(tmp_path):
    from styletransfer_tpu.utils import demo

    p1 = demo.ensure_demo_assets(str(tmp_path / "a"))
    p2 = demo.ensure_demo_assets(str(tmp_path / "b"))
    a = open(p1["content"], "rb").read()
    b = open(p2["content"], "rb").read()
    assert a == b
    assert os.path.isfile(p1["style"])
