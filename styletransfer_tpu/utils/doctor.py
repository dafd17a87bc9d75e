"""Environment diagnostics: ``python -m styletransfer_tpu doctor``.

Born from a real production incident: the tunneled TPU backend once went
UNAVAILABLE for 24+ hours, and distinguishing "first compile is slow"
from "the backend is down" required knowing the right probe (ROADMAP.md,
round 3/4). This command packages that operational knowledge: it probes
the accelerator IN A SUBPROCESS WITH A TIMEOUT (a direct ``jax.devices()``
can block ~30 min during an outage), checks every degradable dependency
this framework runs without (pretrained VGG19, mp4 codecs, demo assets,
checkpoints, compile cache), and says which fallback is active.

Statuses: ``ok`` (working), ``warn`` (degraded, a documented fallback is
in effect), ``fail`` (actionable problem), ``info`` (context). The CLI
exits non-zero only on ``fail`` — warnings are normal in the zero-egress
environments this framework explicitly supports.

The reference has no equivalent (its failure mode is a torch stack trace);
this is framework-added ops surface.
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Callable, List, NamedTuple, Optional


class Check(NamedTuple):
    name: str
    status: str  # ok | warn | fail | info
    detail: str


def _probe_backend(env_extra: dict, timeout: float) -> Check:
    """Ask a SUBPROCESS for jax.devices() so a hung backend init cannot
    hang the doctor (the axon tunnel blocks ~30 min before raising when
    it is down — the whole reason this probe exists)."""
    name = "backend" if not env_extra else "backend (STX_PLATFORM=cpu)"
    env = dict(os.environ, **env_extra)
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import styletransfer_tpu, time; import jax; "
             "import jax.numpy as jnp; d = jax.devices(); "
             "f = jax.jit(lambda v: v + 1.0); "
             "z = jnp.zeros((1,), jnp.float32); "
             "float(jnp.sum(f(z))); "  # compile + first dispatch
             "t0 = time.perf_counter(); float(jnp.sum(f(z))); "
             "rtt = (time.perf_counter() - t0) * 1e3; "
             "print(d[0].platform, len(d), round(rtt, 2))"],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        return Check(
            name, "fail",
            f"no answer in {timeout:.0f}s — a tunneled backend that hangs "
            "here is DOWN, not compiling (it blocks ~30 min before "
            "raising). Escape hatch: STX_PLATFORM=cpu; see ROADMAP.md.",
        )
    if proc.returncode != 0:
        tail = " ".join(proc.stderr.split())[-300:]
        return Check(name, "fail", f"backend init failed: ...{tail}")
    # Parse defensively: libraries may print banners to stdout during
    # init — a diagnostics tool must report oddities, never crash on them.
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    tokens = lines[-1].split() if lines else []
    if len(tokens) != 3 or not tokens[1].isdigit():
        return Check(name, "fail",
                     f"probe printed unexpected output: {proc.stdout!r:.300}")
    # The dispatch round-trip tells a healthy window (tens of ms through
    # a tunnel, sub-ms co-located) from a contended one (hundreds of ms)
    # — the same attribution the serving daemons' STATS now carries.
    return Check(name, "ok",
                 f"{tokens[0]}, {tokens[1]} device(s), "
                 f"dispatch rtt {tokens[2]} ms")


def run_checks(
    backend: str = "auto",
    timeout: float = 120.0,
    progress: Optional[Callable[[Check], None]] = None,
) -> List[Check]:
    """Run every check; ``backend`` is ``auto`` (probe the default
    backend AND the CPU escape hatch), ``cpu`` (escape hatch only —
    fast, used by tests/CI), or ``none`` (skip device probes)."""
    from styletransfer_tpu import constants

    checks: List[Check] = []

    def add(c: Check) -> Check:
        checks.append(c)
        if progress is not None:
            progress(c)
        return c

    import flax
    import jax

    add(Check(
        "versions", "info",
        f"python {sys.version.split()[0]}, jax {jax.__version__}, "
        f"flax {flax.__version__}",
    ))
    root = constants.PROJECT_ROOT_PATH
    add(Check(
        "project root", "ok" if os.access(root, os.W_OK) else "fail",
        f"{root} ({'writable' if os.access(root, os.W_OK) else 'NOT writable'}"
        + (", STX_PROJECT_ROOT override" if os.environ.get("STX_PROJECT_ROOT")
           else "") + ")",
    ))

    if backend == "auto":
        add(_probe_backend({}, timeout))
        add(_probe_backend({"STX_PLATFORM": "cpu"}, timeout))
    elif backend == "cpu":
        add(_probe_backend({"STX_PLATFORM": "cpu"}, timeout))

    # Persistent compile cache: the thing that turns minutes of tunnel
    # compile into seconds on the second run (docs/serving.md).
    from styletransfer_tpu.utils import cache

    cache_dir = cache.cache_dir()
    if os.path.isdir(cache_dir):
        entries = os.listdir(cache_dir)
        size_mb = sum(
            os.path.getsize(os.path.join(cache_dir, f))
            for f in entries if os.path.isfile(os.path.join(cache_dir, f))
        ) / 1e6
        add(Check("compile cache", "ok",
                  f"{cache_dir}: {len(entries)} entries, {size_mb:.0f} MB"))
    else:
        add(Check("compile cache", "warn",
                  f"{cache_dir} does not exist yet (created on first "
                  "compile; first run of each program pays full compile)"))

    # Pretrained VGG19 — optional by design (zero-egress environments get
    # a deterministic seeded init; stylization quality needs the real one).
    from styletransfer_tpu.models import vgg

    w = vgg.find_weights()
    if w:
        add(Check("vgg19 weights", "ok", w))
    else:
        add(Check(
            "vgg19 weights", "warn",
            "not found — seeded-init fallback active (deterministic, but "
            "stylization quality needs pretrained weights): "
            "python scripts/fetch_vgg19.py, or set STX_VGG19_WEIGHTS",
        ))

    # mp4 codecs — optional; GIF fallback is automatic (engines/video.py).
    try:
        import imageio_ffmpeg  # noqa: F401
        add(Check("mp4 codecs", "ok", "imageio-ffmpeg available"))
    except ImportError:
        add(Check("mp4 codecs", "warn",
                  "no ffmpeg/pyav — video output falls back to GIF "
                  "(pip install imageio-ffmpeg to enable .mp4)"))

    # Demo assets + checkpoints: what can be driven right now.
    demo_c = os.path.join(root, "data", "demo_content.png")
    add(Check("demo assets", "ok" if os.path.isfile(demo_c) else "info",
              "present" if os.path.isfile(demo_c) else
              "absent (auto-generated on first use)"))
    models_dir = os.path.join(root, "data", "models")
    if os.path.isdir(models_dir):
        from styletransfer_tpu import ckpt

        names = [f for f in os.listdir(models_dir)
                 if f.endswith((ckpt.CKPT_SUFFIX, ".pth"))
                 or (f.endswith(ckpt.ORBAX_SUFFIX)
                     and os.path.isdir(os.path.join(models_dir, f)))]
        add(Check("checkpoints", "ok" if names else "info",
                  f"{len(names)} checkpoint(s) in {models_dir}"))
    else:
        add(Check("checkpoints", "info",
                  f"{models_dir} absent (created by training)"))

    return checks


def format_checks(checks: List[Check]) -> str:
    tag = {"ok": "[ OK ]", "warn": "[WARN]", "fail": "[FAIL]",
           "info": "[ -- ]"}
    width = max(len(c.name) for c in checks)
    return "\n".join(
        f"{tag[c.status]} {c.name.ljust(width)}  {c.detail}" for c in checks
    )
