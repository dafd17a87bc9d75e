"""Doctor diagnostics tests (utils/doctor.py, `doctor` CLI)."""

import click.testing

from styletransfer_tpu.clis import cli
from styletransfer_tpu.utils import doctor


def test_run_checks_no_backend():
    checks = doctor.run_checks(backend="none")
    names = [c.name for c in checks]
    assert "versions" in names and "vgg19 weights" in names
    assert not any("backend" in n for n in names)
    assert all(c.status in ("ok", "warn", "fail", "info") for c in checks)
    # This environment: no pretrained VGG19, no mp4 codecs — both must be
    # WARN (documented fallbacks), never FAIL.
    by_name = {c.name: c for c in checks}
    assert by_name["vgg19 weights"].status in ("ok", "warn")
    assert by_name["mp4 codecs"].status in ("ok", "warn")
    out = doctor.format_checks(checks)
    assert "[WARN]" in out or "[ OK ]" in out


def test_cpu_backend_probe_subprocess():
    """The cpu escape-hatch probe spawns a real subprocess and must come
    back ok (this is the probe the outage playbook is built on)."""
    checks = doctor.run_checks(backend="cpu", timeout=300)
    probe = [c for c in checks if c.name.startswith("backend")]
    assert len(probe) == 1
    assert probe[0].status == "ok", probe[0].detail
    assert "cpu" in probe[0].detail


def test_doctor_cli_exit_codes():
    runner = click.testing.CliRunner()
    res = runner.invoke(cli, ["doctor", "--backend", "none"])
    assert res.exit_code == 0, res.output  # warns are not failures
    assert "vgg19 weights" in res.output
