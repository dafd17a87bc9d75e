"""Subprocess-level daemon end-to-end tests.

The in-process tests (test_engines.py, test_multistyle.py) exercise the
serve loops by calling them with fake streams; these tests close the last
gap to the SHIPPED binary: each spawns the real CLI
(``python -m styletransfer_tpu <group> serve``) as a subprocess on the CPU
backend and speaks the protocol over actual pipes — READY handshake,
OK/ERR framing (including one malformed request and one RELOAD),
stdout purity (log lines go to stderr only), and a clean exit on EOF.

Sandboxing: ``STX_PROJECT_ROOT`` points every derived path (data/models,
results/, runs/) at a pytest tmp dir, so the subprocess finds exactly the
checkpoint the test wrote and leaves no droppings in the repo.
"""

import os
import subprocess
import sys

import jax
import numpy as np
from PIL import Image

from styletransfer_tpu import ckpt
from styletransfer_tpu.models import transformer

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIZE = 32  # tiny working resolution keeps CPU compiles in seconds


def _spawn(args, tmp_root, stdin_text, timeout=600):
    env = dict(
        os.environ,
        STX_PLATFORM="cpu",
        STX_PROJECT_ROOT=str(tmp_root),
    )
    proc = subprocess.run(
        [sys.executable, "-m", "styletransfer_tpu", *args],
        input=stdin_text, capture_output=True, text=True,
        timeout=timeout, cwd=REPO_ROOT, env=env,
    )
    return proc


def _assert_protocol_stdout(proc, n_lines):
    """stdout must be EXACTLY the protocol: READY then one OK/ERR per
    request — any stray log line would corrupt a pipe-counting client."""
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = proc.stdout.splitlines()
    assert lines, f"empty stdout; stderr: {proc.stderr[-2000:]}"
    assert lines[0] == "READY"
    assert len(lines) == 1 + n_lines, lines
    for line in lines[1:]:
        assert line.startswith(("OK ", "ERR ")), line
    return lines


def _make_content(tmp_root):
    img = tmp_root / "content.png"
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8)
    ).save(img)
    return "content.png"  # project-root-relative, like a real client


def test_fast_serve_daemon_subprocess(tmp_path):
    models = str(tmp_path / "data" / "models")
    ckpt.save_epoch(
        transformer.init_params(jax.random.PRNGKey(0)),
        "fast_st", "sty", 0, models,
    )
    content = _make_content(tmp_path)

    requests = (
        f"{content}\n"                      # default naming -> OK
        f"{content}\tout/explicit.png\n"    # explicit output -> OK
        f"{content}\ta\tb\tc\n"             # too many fields -> ERR
        "missing.png\n"                     # unreadable input -> ERR
        "RELOAD\n"                          # hot-swap -> OK (epoch 0 exists)
        "STATS\n"                           # in-band health -> OK STATS
    )
    proc = _spawn(
        ["fast_st", "serve", "sty", "--size", str(SIZE)], tmp_path, requests
    )
    lines = _assert_protocol_stdout(proc, 6)
    assert lines[1].startswith("OK ") and lines[2].startswith("OK ")
    assert "expected INPUT[\\tOUTPUT[\\tSIZE]], got 4 fields" in lines[3]
    assert lines[4].startswith("ERR missing.png")
    assert lines[5] == "OK RELOAD epoch=0"
    assert lines[6].startswith("OK STATS ok=2 err=2") and "p50_ms=" in lines[6]
    # The daemon really wrote where it said it did, inside the sandbox.
    assert os.path.isfile(lines[1].split(" ", 1)[1])
    assert os.path.isfile(str(tmp_path / "out" / "explicit.png"))
    # Logs went to stderr (compile line, shutdown line), not stdout.
    assert "shutting down" in proc.stderr


def test_video_serve_daemon_subprocess(tmp_path):
    models = str(tmp_path / "data" / "models")
    ckpt.save_epoch(
        transformer.init_video_params(jax.random.PRNGKey(0)),
        "video_st", "sty", 0, models,
    )
    content = _make_content(tmp_path)

    requests = (
        f"{content}\n"          # frame 1 (fresh carry) -> OK
        f"{content}\n"          # frame 2 (carry persists) -> OK
        "RESET\n"               # -> OK RESET
        f"{content}\ta\tb\tc\td\n" # too many fields -> ERR
        "RELOAD\n"              # -> OK (same checkpoint)
    )
    proc = _spawn(
        ["video_st", "serve", "sty", "--size", str(SIZE)], tmp_path, requests
    )
    lines = _assert_protocol_stdout(proc, 5)
    assert lines[1].startswith("OK ") and lines[2].startswith("OK ")
    assert lines[3] == "OK RESET"
    assert ("expected FRAME[\\tOUTPUT[\\tSTREAM[\\tSIZE]]], got 5 fields"
            in lines[4])
    assert lines[5].startswith("OK RELOAD")
    assert os.path.isfile(lines[1].split(" ", 1)[1])


def test_fast_serve_tcp_subprocess(tmp_path):
    """The shipped binary behind the TCP transport: spawn
    ``fast_st serve --tcp 127.0.0.1:0``, read the bound port off stdout,
    and speak the protocol over real sockets from two concurrent clients
    — READY handshake per connection, OK/ERR framing, SHUTDOWN from one
    client stopping the daemon, and a protocol-pure stdout."""
    import socket

    models = str(tmp_path / "data" / "models")
    ckpt.save_epoch(
        transformer.init_params(jax.random.PRNGKey(0)),
        "fast_st", "sty", 0, models,
    )
    content = _make_content(tmp_path)
    env = dict(
        os.environ, STX_PLATFORM="cpu", STX_PROJECT_ROOT=str(tmp_path)
    )
    proc = subprocess.Popen(
        [sys.executable, "-m", "styletransfer_tpu", "fast_st", "serve",
         "sty", "--size", str(SIZE), "--tcp", "127.0.0.1:0"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO_ROOT, env=env,
    )
    try:
        banner = proc.stdout.readline().strip()
        assert banner.startswith("TCP 127.0.0.1 "), banner
        port = int(banner.split()[2])

        c1 = socket.create_connection(("127.0.0.1", port), timeout=600)
        c1.settimeout(600)
        r1 = c1.makefile("r", encoding="utf-8")
        assert r1.readline().strip() == "READY"  # waits out the compile

        c1.sendall(f"{content}\n".encode())
        resp = r1.readline().strip()
        assert resp.startswith("OK "), resp
        assert os.path.isfile(resp.split(" ", 1)[1])

        c2 = socket.create_connection(("127.0.0.1", port), timeout=60)
        c2.settimeout(60)
        r2 = c2.makefile("r", encoding="utf-8")
        assert r2.readline().strip() == "READY"  # greeted post-compile
        c2.sendall(b"missing.png\n")
        assert r2.readline().strip().startswith("ERR missing.png")
        c2.sendall(b"\n")  # goodbye closes only this connection
        assert r2.readline() == ""

        c1.sendall(f"{content}\tout/tcp.png\n".encode())
        assert r1.readline().strip() == "OK " + str(tmp_path / "out" / "tcp.png")
        c1.sendall(b"SHUTDOWN\n")
        assert r1.readline().strip() == "OK SHUTDOWN"
        out, err = proc.communicate(timeout=120)
        assert proc.returncode == 0, err[-2000:]
        # stdout purity: only the one handshake line was left unread.
        assert out.splitlines() == ["READY"], out
        assert "shutting down" in err
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate(timeout=30)


def test_gatys_serve_daemon_subprocess(tmp_path):
    """The gatys daemon is checkpoint-free (each request is an
    optimization); RELOAD must answer an explanatory ERR, not crash."""
    content = _make_content(tmp_path)
    style = tmp_path / "style.png"
    rng = np.random.default_rng(1)
    Image.fromarray(
        rng.integers(0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8)
    ).save(style)

    requests = (
        f"{content}\tstyle.png\n"   # one optimization -> OK ... loss=
        f"{content}\tstyle.png,{content}:0.8,0.2\n"  # blend spec -> OK
        f"{content}\n"              # missing STYLE field -> ERR
        "RELOAD\n"                  # stateless daemon -> explanatory ERR
    )
    proc = _spawn(
        ["gatys_st", "--serve", "-s", "2", "--size", str(SIZE),
         "--optimizer", "adam"],
        tmp_path, requests,
    )
    lines = _assert_protocol_stdout(proc, 4)
    assert lines[1].startswith("OK ") and "loss=" in lines[1]
    assert lines[2].startswith("OK ") and "style+content_0.8_0.2.png" in lines[2]
    assert "expected CONTENT\\tSTYLE[\\tOUTPUT]" in lines[3]
    assert lines[4].startswith("ERR RELOAD") and "stateless" in lines[4]
    assert os.path.isfile(lines[1].split(" ", 2)[1])


def test_fast_serve_http_subprocess(tmp_path):
    """The shipped binary behind the HTTP gateway: spawn
    ``fast_st serve --http 127.0.0.1:0``, read the bound port off stdout,
    and drive the REST surface with a plain urllib client — /healthz
    gating, a stylize round-trip carrying image BYTES both ways, in-band
    /stats, and a clean /shutdown."""
    import io
    import json
    import urllib.error
    import urllib.request

    models = str(tmp_path / "data" / "models")
    ckpt.save_epoch(
        transformer.init_params(jax.random.PRNGKey(0)),
        "fast_st", "sty", 0, models,
    )
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, size=(SIZE, SIZE, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="PNG")
    body = buf.getvalue()

    env = dict(
        os.environ, STX_PLATFORM="cpu", STX_PROJECT_ROOT=str(tmp_path)
    )
    proc = subprocess.Popen(
        [sys.executable, "-m", "styletransfer_tpu", "fast_st", "serve",
         "sty", "--size", str(SIZE), "--http", "127.0.0.1:0"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO_ROOT, env=env,
    )
    try:
        banner = proc.stdout.readline().strip()
        assert banner.startswith("HTTP 127.0.0.1 "), banner
        port = int(banner.split()[2])
        base = f"http://127.0.0.1:{port}"

        def req(path, data=None, method=None, timeout=600):
            r = urllib.request.Request(base + path, data=data, method=method)
            try:
                with urllib.request.urlopen(r, timeout=timeout) as resp:
                    return resp.status, dict(resp.headers), resp.read()
            except urllib.error.HTTPError as e:
                return e.code, dict(e.headers), e.read()

        # READY on the process stdout still gates /healthz.
        assert proc.stdout.readline().strip() == "READY"
        status, _, _ = req("/healthz")
        assert status == 200

        status, headers, png = req("/v1/stylize", data=body, method="POST")
        assert status == 200, png[:200]
        assert headers["Content-Type"] == "image/png"
        out = np.asarray(Image.open(io.BytesIO(png)))
        assert out.shape == (SIZE, SIZE, 3) and out.dtype == np.uint8

        # An undecodable body is the engine's ERR -> 422 with the reason.
        status, _, reason = req("/v1/stylize", data=b"not an image",
                                method="POST")
        assert status == 422, reason

        status, _, stats = req("/stats?format=json")
        assert status == 200
        parsed = json.loads(stats)
        assert parsed["ok"] == 1 and parsed["err"] == 1

        status, _, _ = req("/shutdown", data=b"", method="POST")
        assert status == 200
        out_text, err = proc.communicate(timeout=120)
        assert proc.returncode == 0, err[-2000:]
        # stdout purity: the two handshake lines were consumed above;
        # nothing else may appear on the protocol stream.
        assert out_text.strip() == "", out_text
        assert "shutting down" in err
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate(timeout=30)


def test_fast_serve_sigterm_graceful_subprocess(tmp_path):
    """The supervisor stop contract against the shipped binary: SIGTERM
    to a warm pipe daemon makes it finish what it owes and exit 0 — the
    response to a request sent just before the signal still arrives, the
    graceful-shutdown path is logged, and stdout stays protocol-pure."""
    import signal

    models = str(tmp_path / "data" / "models")
    ckpt.save_epoch(
        transformer.init_params(jax.random.PRNGKey(0)),
        "fast_st", "sty", 0, models,
    )
    content = _make_content(tmp_path)
    env = dict(
        os.environ, STX_PLATFORM="cpu", STX_PROJECT_ROOT=str(tmp_path)
    )
    proc = subprocess.Popen(
        [sys.executable, "-m", "styletransfer_tpu", "fast_st", "serve",
         "sty", "--size", str(SIZE)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, cwd=REPO_ROOT, env=env,
    )
    try:
        assert proc.stdout.readline().strip() == "READY"
        proc.stdin.write(f"{content}\tout/pre_sig.png\n")
        proc.stdin.flush()
        resp = proc.stdout.readline().strip()
        assert resp == "OK " + str(tmp_path / "out" / "pre_sig.png"), resp

        proc.send_signal(signal.SIGTERM)  # idle daemon: graceful exit
        out, err = proc.communicate(timeout=120)
        assert proc.returncode == 0, err[-2000:]
        assert out.strip() == "", out  # nothing unread on the protocol
        assert "graceful shutdown on signal" in err, err[-2000:]
        assert "shutting down after 1 request(s)" in err
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate(timeout=30)
