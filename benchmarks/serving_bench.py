"""On-TPU latency measurements for the warm-process serving daemons.

Spawns the REAL CLIs (``python -m styletransfer_tpu ... serve``) as
subprocesses — the same binary a deployment runs — and measures what
docs/serving.md's tables cite:

- ``gatys``  — `gatys_st --serve`: READY (compile) time, warm single
  round-trip, and a ``-b 4`` mixed-style burst (two styles alternating,
  per-lane Gram targets) — group latency + per-request amortized.
- ``video``  — `video_st serve`: multi-stream wave latency at 2/8/64
  concurrent streams (one daemon per width: ragged waves pad to the
  compiled lane count, so each width is its own honest program).
- ``reload`` — `fast_st serve`: per-request round-trip under continuous
  load with a RELOAD hot-swap injected mid-stream — steady-state p50
  before, the RELOAD's own round-trip, and the worst request after the
  swap (is the swap really zero-downtime?).
- ``fast``   — `fast_st serve`: warm single round-trip and a ``-b 16``
  64-request burst (re-captures the round-3 190 ms / 17 req/s numbers).

Requests ride the daemons' line protocol over actual pipes, so every
number includes decode + uint8 transfer + execute + PNG encode — the
end-to-end figure a client sees (on the tunneled bench TPU the tunnel
RTT dominates; co-located serving tracks docs/performance.md).

Run: ``python benchmarks/serving_bench.py [gatys video reload fast]``
Env: SERVE_SIZE (working resolution, default 256; CPU smoke: 32),
SERVE_STEPS (gatys steps/request, default 50), SERVE_WAVES (waves per
width, default 5), SERVE_SANDBOX (reuse a sandbox dir across runs to
keep checkpoints/images stable).

Output: one JSON object on stdout; progress on stderr.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SIZE = int(os.environ.get("SERVE_SIZE", "256"))
STEPS = int(os.environ.get("SERVE_STEPS", "50"))
WAVES = int(os.environ.get("SERVE_WAVES", "5"))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


class Daemon:
    """One serve subprocess speaking the line protocol over pipes."""

    def __init__(self, args, sandbox, ready_timeout=3600, extra_env=None):
        env = dict(os.environ, STX_PROJECT_ROOT=str(sandbox),
                   **(extra_env or {}))
        self.stderr_path = os.path.join(
            sandbox, f"daemon_{abs(hash(tuple(args)))}.stderr")
        self._stderr = open(self.stderr_path, "w")
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "styletransfer_tpu", *args],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=self._stderr, text=True, bufsize=1,
            cwd=REPO_ROOT, env=env,
        )
        t0 = time.time()
        deadline = t0 + ready_timeout
        while True:
            line = self.proc.stdout.readline()
            if line.strip() == "READY":
                break
            if not line or time.time() > deadline:
                raise RuntimeError(
                    f"daemon {args} died before READY; see {self.stderr_path}")
        self.ready_s = time.time() - t0

    def request(self, line: str) -> tuple[str, float]:
        """One round-trip: write a request line, read its response line."""
        t0 = time.time()
        self.proc.stdin.write(line + "\n")
        self.proc.stdin.flush()
        resp = self.proc.stdout.readline().strip()
        return resp, time.time() - t0

    def burst(self, lines: list[str]) -> tuple[list[str], float]:
        """Pipelined group: write every line, then read every response."""
        t0 = time.time()
        self.proc.stdin.write("".join(l + "\n" for l in lines))
        self.proc.stdin.flush()
        resps = [self.proc.stdout.readline().strip() for _ in lines]
        return resps, time.time() - t0

    def close(self) -> None:
        try:
            self.proc.stdin.close()
            self.proc.wait(timeout=120)
        except Exception:
            self.proc.kill()
        self._stderr.close()


_PROBE_SRC = """
import sys, time
import styletransfer_tpu  # same backend selection as the daemons
import jax, jax.numpy as jnp
x = jnp.zeros((1,), jnp.float32)
float(x.sum())  # backend init + first dispatch
print("READY", flush=True)
i = 0
for line in sys.stdin:
    if not line.strip():
        break
    i += 1
    t0 = time.perf_counter()
    y = x + float(i)  # tiny compiled add: dispatch + scalar readback = RTT
    _ = float(jnp.sum(y))
    print(f"{(time.perf_counter() - t0) * 1e3:.2f}", flush=True)
"""


class RTTProbe:
    """Persistent child measuring the tunnel round-trip (1-element device
    dispatch + scalar readback) so every serving figure carries an RTT
    attribution — the tables' ±30-40% swings are tunnel weather, and
    without this column a reader can't attribute them (VERDICT r04)."""

    def __init__(self, ready_timeout_s: float = 600.0):
        import queue
        import threading

        self.proc = subprocess.Popen(
            [sys.executable, "-c", _PROBE_SRC],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1, cwd=REPO_ROOT,
        )
        # readline() blocks with no timeout, so a child wedged in backend
        # init would hang the whole bench before it measured anything —
        # read through a thread + queue so every wait is bounded.
        self._q: "queue.Queue" = queue.Queue()

        def reader():
            try:
                for line in self.proc.stdout:
                    self._q.put(line)
            finally:
                self._q.put(None)  # EOF/death sentinel

        threading.Thread(target=reader, daemon=True,
                         name="rtt-probe-reader").start()
        import queue as _qmod

        deadline = time.time() + ready_timeout_s
        while True:
            try:
                line = self._q.get(timeout=max(0.1, deadline - time.time()))
            except _qmod.Empty:
                self.proc.kill()
                raise RuntimeError(
                    f"RTT probe not READY within {ready_timeout_s:.0f}s")
            if line is None:
                raise RuntimeError("RTT probe died before READY")
            if line.strip() == "READY":
                return

    def sample(self, n: int = 5, timeout_s: float = 60.0):
        """p50/min of n probe round-trips, or None if the probe is dead
        or wedged — an unmeasurable RTT must never abort the bench and
        discard the sections already measured."""
        import queue

        try:
            vals = []
            for _ in range(n):
                self.proc.stdin.write("go\n")
                self.proc.stdin.flush()
                line = self._q.get(timeout=timeout_s)
                if line is None:
                    return None
                vals.append(float(line))
            return {"p50_ms": round(statistics.median(vals), 2),
                    "min_ms": round(min(vals), 2)}
        except (queue.Empty, ValueError, OSError):
            return None

    def close(self) -> None:
        try:
            self.proc.stdin.close()
            self.proc.wait(timeout=30)
        except Exception:  # noqa: BLE001 - best-effort teardown
            self.proc.kill()


def _check(resps) -> None:
    bad = [r for r in resps if not r.startswith("OK")]
    if bad:
        raise RuntimeError(f"daemon answered ERR: {bad[:3]}")


def make_sandbox() -> str:
    """Populate a project-root sandbox: checkpoints, content, styles."""
    sandbox = os.environ.get("SERVE_SANDBOX")
    if sandbox and os.path.isdir(os.path.join(sandbox, "data", "models")):
        return sandbox  # reuse (stable ckpt => persistent-cache hits)
    sandbox = sandbox or tempfile.mkdtemp(prefix="serving_bench_")
    os.makedirs(os.path.join(sandbox, "data", "models"), exist_ok=True)

    import numpy as np
    from PIL import Image

    import jax

    # The parent process only ever inits params to write seed checkpoints —
    # pin it to CPU so setup never pays tunnel RTTs per eager init op (a
    # slow window turned this into minutes) nor touches the device the
    # daemons are being measured on. Daemon subprocesses inherit os.environ
    # (not this config) and keep the real backend.
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001 - backend already initialized: use as-is
        pass

    from styletransfer_tpu import ckpt
    from styletransfer_tpu.models import transformer

    models = os.path.join(sandbox, "data", "models")
    ckpt.save_epoch(transformer.init_params(jax.random.PRNGKey(0)),
                    "fast_st", "sty", 0, models)
    ckpt.save_epoch(transformer.init_video_params(jax.random.PRNGKey(0)),
                    "video_st", "sty", 0, models)
    rng = np.random.default_rng(0)
    for name in ("content.png", "style_a.png", "style_b.png"):
        Image.fromarray(rng.integers(
            0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8)
        ).save(os.path.join(sandbox, name))
    return sandbox


def bench_gatys(sandbox: str) -> dict:
    out = {"steps": STEPS}
    base = ["gatys_st", "--serve", "-s", str(STEPS), "--size", str(SIZE)]
    # The shipped default (torch-contract lbfgs) is what we measure on
    # TPU; SERVE_GATYS_OPT=adam keeps the CPU smoke's compile in seconds.
    opt = os.environ.get("SERVE_GATYS_OPT")
    if opt:
        base += ["--optimizer", opt]
        out["optimizer"] = opt

    log(f"[gatys] spawning single-lane daemon (-s {STEPS})...")
    d = Daemon(base, sandbox)
    out["ready_s"] = round(d.ready_s, 1)
    # First request pays the gram-target compile + style cache fill.
    _check([d.request("content.png\tstyle_a.png")[0]])
    ts = []
    for i in range(3):
        resp, dt = d.request(f"content.png\tstyle_a.png\tout/g{i}.png")
        _check([resp])
        ts.append(dt)
    out["single_rt_s"] = round(statistics.median(ts), 2)
    d.close()

    log("[gatys] spawning -b 4 daemon for mixed-style lanes...")
    d = Daemon(base + ["-b", "4"], sandbox)
    out["ready_b4_s"] = round(d.ready_s, 1)
    mixed = [f"content.png\t{s}\tout/gb{i}.png"
             for i, s in enumerate(["style_a.png", "style_b.png"] * 2)]
    _check(d.burst(mixed)[0])  # warm: batched program + style-b grams
    ts = []
    for _ in range(3):
        resps, dt = d.burst(mixed)
        _check(resps)
        ts.append(dt)
    d.close()
    dt = statistics.median(ts)
    out["b4_mixed_group_s"] = round(dt, 2)
    out["b4_mixed_per_req_s"] = round(dt / 4, 2)
    return out


def bench_video(sandbox: str) -> dict:
    out = {}
    for streams in (2, 8, 64):
        log(f"[video] {streams}-stream waves...")
        d = Daemon(
            ["video_st", "serve", "sty", "--size", str(SIZE),
             "-b", str(streams), "--max-streams", str(streams)],
            sandbox,
        )
        wave = [f"content.png\tout/v{s}.png\ts{s}" for s in range(streams)]
        _check(d.burst(wave)[0])  # warm the padded lane-width program
        ts = []
        for _ in range(WAVES):
            resps, dt = d.burst(wave)
            _check(resps)
            ts.append(dt)
        d.close()
        med = statistics.median(ts)
        out[f"wave{streams}_s"] = round(med, 3)
        out[f"wave{streams}_ms_per_frame"] = round(med / streams * 1e3, 1)
        out[f"ready{streams}_s"] = round(d.ready_s, 1)
    return out


def bench_reload(sandbox: str) -> dict:
    log("[reload] fast daemon under load with a mid-stream RELOAD...")
    d = Daemon(["fast_st", "serve", "sty", "--size", str(SIZE)], sandbox)
    _check([d.request("content.png\tout/r_warm.png")[0]])
    before, after = [], []
    for i in range(20):
        resp, dt = d.request(f"content.png\tout/r{i}.png")
        _check([resp])
        before.append(dt)
    resp, reload_dt = d.request("RELOAD")
    _check([resp])
    for i in range(10):
        resp, dt = d.request(f"content.png\tout/ra{i}.png")
        _check([resp])
        after.append(dt)
    d.close()
    q = statistics.quantiles(before, n=20)
    return {
        "steady_p50_ms": round(statistics.median(before) * 1e3, 1),
        "steady_p95_ms": round(q[-1] * 1e3, 1),
        "reload_rt_ms": round(reload_dt * 1e3, 1),
        "post_reload_max_ms": round(max(after) * 1e3, 1),
        "post_reload_p50_ms": round(statistics.median(after) * 1e3, 1),
    }


def bench_fast(sandbox: str) -> dict:
    out = {}
    log("[fast] single round-trips...")
    d = Daemon(["fast_st", "serve", "sty", "--size", str(SIZE)], sandbox)
    out["ready_s"] = round(d.ready_s, 1)
    _check([d.request("content.png\tout/f_warm.png")[0]])
    ts = []
    for i in range(16):
        resp, dt = d.request(f"content.png\tout/f{i}.png")
        _check([resp])
        ts.append(dt)
    out["single_rt_ms"] = round(statistics.median(ts) * 1e3, 1)
    d.close()

    log("[fast] -b 16 burst of 64...")
    d = Daemon(["fast_st", "serve", "sty", "--size", str(SIZE),
                "-b", "16"], sandbox)
    burst = [f"content.png\tout/fb{i}.png" for i in range(64)]
    _check(d.burst(burst[:16])[0])  # warm the 16-lane program
    resps, dt = d.burst(burst)
    _check(resps)
    out["b16_req_per_s"] = round(64 / dt, 1)
    d.close()
    return out


def bench_pipeline(sandbox: str) -> dict:
    """A/B the pipelined wave schedule: the same ``fast_st serve -b 8``
    binary with STX_SERVE_PIPELINE_DEPTH=0 (strictly serial waves — the
    shipped default, a measured decision from THIS bench: 93.7 vs 95.8
    ms/req on the tunneled TPU) vs 1 (group k+1's decode+dispatch
    overlaps group k's fetch+encode). Sustained 64-request bursts; the
    delta is what the pipeline hides."""
    out = {}
    for depth in (0, 1):
        log(f"[pipeline] -b 8 burst of 64 at depth {depth}...")
        d = Daemon(["fast_st", "serve", "sty", "--size", str(SIZE),
                    "-b", "8"], sandbox,
                   extra_env={"STX_SERVE_PIPELINE_DEPTH": str(depth)})
        burst = [f"content.png\tout/pb{i}.png" for i in range(64)]
        _check(d.burst(burst[:8])[0])  # warm the 8-lane program
        ts = []
        for _ in range(3):
            resps, dt = d.burst(burst)
            _check(resps)
            ts.append(dt)
        d.close()
        dt = statistics.median(ts)
        out[f"depth{depth}_req_per_s"] = round(64 / dt, 1)
        out[f"depth{depth}_ms_per_req"] = round(dt / 64 * 1e3, 1)
    if out.get("depth0_ms_per_req"):
        out["speedup"] = round(
            out["depth0_ms_per_req"] / out["depth1_ms_per_req"], 2)
    return out


BENCHES = {"gatys": bench_gatys, "video": bench_video,
           "reload": bench_reload, "fast": bench_fast,
           "pipeline": bench_pipeline}


def main() -> None:
    names = sys.argv[1:] or list(BENCHES)
    unknown = set(names) - set(BENCHES)
    if unknown:
        sys.exit(f"unknown benches: {sorted(unknown)} (have {list(BENCHES)})")
    sandbox = make_sandbox()
    log(f"sandbox: {sandbox} (size={SIZE})")
    probe = None
    if os.environ.get("SERVE_SKIP_RTT") != "1":
        probe = RTTProbe()
        log(f"rtt probe ready: {probe.sample()}")
    results = {"size": SIZE}
    try:
        for name in names:
            t0 = time.time()
            if probe:
                rtt_before = probe.sample()
            results[name] = BENCHES[name](sandbox)
            if probe:
                results[name]["rtt_before"] = rtt_before
                results[name]["rtt_after"] = probe.sample()
            log(f"[{name}] done in {time.time() - t0:.0f}s: "
                f"{json.dumps(results[name])}")
    finally:
        if probe:
            probe.close()
        # Whatever completed is worth printing — a late section's failure
        # must not discard hours of earlier measurements.
        print(json.dumps(results))


if __name__ == "__main__":
    main()
