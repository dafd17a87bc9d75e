"""Pipe vs TCP vs HTTP transport overhead for the serving daemons.

The TCP transport (engines/netserve.py) adds a listener, per-client
reader threads, and a FIFO response router in front of the same engine
loops the pipe daemons run; the HTTP gateway (engines/httpserve.py)
adds request parsing plus a temp-file spool for the image bytes riding
the bodies. This bench measures what each costs per request, end to
end, against the SHIPPED binary (``python -m styletransfer_tpu fast_st
serve``):

- serial phase: N request→response round-trips, one at a time (the
  latency a lone client sees);
- burst phase: N requests in flight at once with ``-b BATCH`` dynamic
  batching (the throughput a bursty client sees; over HTTP this is N
  concurrent connections — cross-connection batching is the claim
  docs/serving.md makes, so it is what gets measured).

Each phase runs over the process pipes, a localhost socket, and a
localhost HTTP gateway; the deltas are the transport overhead. Run it
on the TPU host for the serving tables in docs/serving.md; on CPU
(STX_PLATFORM=cpu) it still isolates the transport delta — the engine
work is identical on all sides. (The HTTP rows carry the image bytes in
the bodies — upload + spool + PNG response download — where pipe/TCP
rows exchange paths; that byte-shuttling IS the gateway's honest cost.)

Run: python benchmarks/tcp_transport_bench.py
Env: TCPB_N (default 32), TCPB_SIZE (256), TCPB_BATCH (8)
"""

import concurrent.futures
import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

N = int(os.environ.get("TCPB_N", "32"))
SIZE = int(os.environ.get("TCPB_SIZE", "256"))
BATCH = int(os.environ.get("TCPB_BATCH", "8"))
STYLE = "demo_style.png"


def ensure_assets():
    """Demo content + a fast_st checkpoint for STYLE (seeded init if absent)."""
    import jax

    from styletransfer_tpu import ckpt
    from styletransfer_tpu.models import transformer
    from styletransfer_tpu.utils import demo

    assets = demo.ensure_demo_assets()
    if not ckpt.epoch_checkpoint_exists("fast_st", STYLE, 0):
        ckpt.save_epoch(
            transformer.init_params(jax.random.PRNGKey(0)), "fast_st", STYLE, 0
        )
    return os.path.relpath(assets["content"], REPO_ROOT)


def _drive(req_w, resp_r, content):
    # READY (the compile happens here on a cold cache).
    t0 = time.time()
    line = resp_r.readline()
    while line and line.strip() != "READY":
        line = resp_r.readline()
    assert line, "daemon exited before READY"
    ready_s = time.time() - t0

    out = {"ready_s": round(ready_s, 1)}
    # Serial: one in-flight request at a time.
    t0 = time.time()
    for _ in range(N):
        req_w.write(content + "\n")
        req_w.flush()
        resp = resp_r.readline().strip()
        assert resp.startswith("OK "), resp
    out["serial_ms"] = round((time.time() - t0) / N * 1e3, 1)
    # Burst: pipeline everything, let the daemon group up to BATCH.
    t0 = time.time()
    for _ in range(N):
        req_w.write(content + "\n")
    req_w.flush()
    for _ in range(N):
        resp = resp_r.readline().strip()
        assert resp.startswith("OK "), resp
    out["burst_ms"] = round((time.time() - t0) / N * 1e3, 1)
    return out


def run_pipe(content):
    proc = subprocess.Popen(
        [sys.executable, "-m", "styletransfer_tpu", "fast_st", "serve",
         STYLE, "--size", str(SIZE), "-b", str(BATCH)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1, cwd=REPO_ROOT,
    )
    try:
        out = _drive(proc.stdin, proc.stdout, content)
        proc.stdin.write("\n")
        proc.stdin.flush()
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    return out


def run_tcp(content):
    proc = subprocess.Popen(
        [sys.executable, "-m", "styletransfer_tpu", "fast_st", "serve",
         STYLE, "--size", str(SIZE), "-b", str(BATCH),
         "--tcp", "127.0.0.1:0"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        bufsize=1, cwd=REPO_ROOT,
    )
    try:
        banner = proc.stdout.readline().split()
        port = int(banner[2])
        sock = socket.create_connection(("127.0.0.1", port), timeout=1200)
        sock.settimeout(1200)
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        req_w = sock.makefile("w", encoding="utf-8")
        resp_r = sock.makefile("r", encoding="utf-8")
        out = _drive(req_w, resp_r, content)
        req_w.write("SHUTDOWN\n")
        req_w.flush()
        assert resp_r.readline().strip() == "OK SHUTDOWN"
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    return out


def run_http(content):
    with open(os.path.join(REPO_ROOT, content), "rb") as f:
        body = f.read()
    proc = subprocess.Popen(
        [sys.executable, "-m", "styletransfer_tpu", "fast_st", "serve",
         STYLE, "--size", str(SIZE), "-b", str(BATCH),
         "--http", "127.0.0.1:0"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        bufsize=1, cwd=REPO_ROOT,
    )
    try:
        banner = proc.stdout.readline().split()
        port = int(banner[2])
        url = f"http://127.0.0.1:{port}/v1/stylize"

        def post():
            req = urllib.request.Request(url, data=body, method="POST")
            with urllib.request.urlopen(req, timeout=1200) as resp:
                png = resp.read()
                assert resp.status == 200 and png[:4] == b"\x89PNG"

        t0 = time.time()
        assert proc.stdout.readline().strip() == "READY"
        out = {"ready_s": round(time.time() - t0, 1)}
        t0 = time.time()
        for _ in range(N):
            post()
        out["serial_ms"] = round((time.time() - t0) / N * 1e3, 1)
        # Burst = N concurrent connections; the gateway's mux feeds them
        # to the engine loop, which groups up to BATCH per device call.
        with concurrent.futures.ThreadPoolExecutor(max_workers=N) as pool:
            t0 = time.time()
            futs = [pool.submit(post) for _ in range(N)]
            for f in futs:
                f.result()
            out["burst_ms"] = round((time.time() - t0) / N * 1e3, 1)
        urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/shutdown", data=b"", method="POST"),
            timeout=60).read()
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    return out


def main():
    content = ensure_assets()
    rows = []
    for transport, fn in (("pipe", run_pipe), ("tcp", run_tcp),
                          ("http", run_http)):
        r = {"transport": transport, **fn(content)}
        rows.append(r)
        print(f"{transport}: {r}", file=sys.stderr)
    pipe, tcp, http = rows
    print(json.dumps({
        "n": N, "size": SIZE, "batch": BATCH, "rows": rows,
        "serial_overhead_ms": round(tcp["serial_ms"] - pipe["serial_ms"], 1),
        "burst_overhead_ms": round(tcp["burst_ms"] - pipe["burst_ms"], 1),
        "http_serial_overhead_ms": round(
            http["serial_ms"] - pipe["serial_ms"], 1),
        "http_burst_overhead_ms": round(
            http["burst_ms"] - pipe["burst_ms"], 1),
    }, indent=2))


if __name__ == "__main__":
    main()
