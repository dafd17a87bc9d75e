"""``doctor`` CLI — environment diagnostics (see utils/doctor.py)."""

import sys

import click


@click.command()
@click.option("--backend", default="auto",
              type=click.Choice(["auto", "cpu", "none"]),
              help="Device probes: auto probes the default backend AND the "
                   "STX_PLATFORM=cpu escape hatch; cpu probes only the "
                   "escape hatch (fast); none skips device probes.")
@click.option("--timeout", default=120.0, show_default=True,
              help="Per-probe timeout in seconds. A tunneled TPU backend "
                   "that cannot answer within this is down, not slow "
                   "(outage playbook: ROADMAP.md).")
def doctor(backend, timeout):
    """
    Diagnose the environment: probe the accelerator (in a subprocess, with
    a timeout — a dead tunneled backend hangs for ~30 min if probed
    directly), and report the state of every degradable dependency
    (pretrained VGG19, mp4 codecs, compile cache, demo assets,
    checkpoints) with the fallback that is active for each.

    Exits non-zero only if something is actually broken ([FAIL]);
    [WARN] rows are documented degraded modes.
    """
    from styletransfer_tpu.utils import doctor as doc

    tag = {"ok": "[ OK ]", "warn": "[WARN]", "fail": "[FAIL]",
           "info": "[ -- ]"}
    checks = doc.run_checks(
        backend=backend, timeout=timeout,
        progress=lambda c: print(f"{tag[c.status]} {c.name}: {c.detail}",
                                 flush=True),
    )
    if any(c.status == "fail" for c in checks):
        sys.exit(1)
