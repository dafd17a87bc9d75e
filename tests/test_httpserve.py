"""HTTP gateway transport tests (engines/httpserve.py).

Like the TCP transport tests (test_netserve.py), these drive the REAL
gateway — real sockets, real HTTP — over fake engine loops (the real
loops are pinned in test_engines.py / test_daemon_e2e.py) and check the
transport consequences: READY gating of /healthz, body→spool→engine→PNG
routing, ERR→422 mapping, in-band STATS (text and JSON), command routes
(/reload, /reset), clean /shutdown, and response routing under a batched
loop with concurrent clients.
"""

import io
import json
import os
import threading
import urllib.error
import urllib.request

import pytest

from styletransfer_tpu.engines import daemon, httpserve


# ---------------------------------------------------------------------------
# Harness


class _Server:
    """serve_over_http on a fake loop, in a thread, with the bound port."""

    def __init__(self, run_loop, kind="fast", name="t"):
        self.port = None
        self._port_ready = threading.Event()
        self.result = None
        self.stdout = io.StringIO()

        def on_listen(p):
            self.port = p
            self._port_ready.set()

        def main():
            self.result = httpserve.serve_over_http(
                run_loop, host="127.0.0.1", port=0, kind=kind,
                stdout=self.stdout, name=name, _on_listen=on_listen,
            )

        self.thread = threading.Thread(target=main, daemon=True)
        self.thread.start()
        assert self._port_ready.wait(10), "gateway never bound"

    def url(self, path):
        return f"http://127.0.0.1:{self.port}{path}"

    def request(self, path, data=None, method=None, timeout=30):
        """Returns (status, headers, body bytes); HTTP errors unify."""
        req = urllib.request.Request(self.url(path), data=data, method=method)
        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.status, dict(r.headers), r.read()
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers), e.read()

    def join(self, timeout=30):
        self.thread.join(timeout)
        assert not self.thread.is_alive(), "gateway did not shut down"


def _reverse_loop(gate: threading.Event = None, kind_payload=None):
    """A fake engine serve loop: OUTPUT = reversed INPUT bytes.

    ``gate`` (optional) delays READY so tests can see the compiling
    state. ``kind_payload`` overrides the OK payload (e.g. the gatys
    daemon's ``<out> loss=..`` form).
    """

    def run_loop(stdin, stdout):
        def handle(*fields):
            in_path, out_path = fields[0], fields[1]
            with open(in_path, "rb") as f:
                data = f.read()
            if data == b"BOOM":
                raise ValueError("bad image payload")
            with open(out_path, "wb") as f:
                f.write(data[::-1])
            if kind_payload is not None:
                return kind_payload(out_path)
            return out_path

        if gate is not None:
            assert gate.wait(10)
        print("READY", file=stdout, flush=True)
        return daemon.run_request_loop(
            handle, stdin=stdin, stdout=stdout, name="fake",
            commands={"RELOAD": lambda: "RELOAD epoch=7"},
        )

    return run_loop


# ---------------------------------------------------------------------------
# Unit pieces


def test_build_request_line_shapes():
    b = httpserve.build_request_line
    assert b("fast", "i", "o", {}) == "i\to"
    assert b("fast", "i", "o", {"size": ["512"]}) == "i\to\t512"
    assert b("multi", "i", "o", {}) == "i\to\t0"
    assert b("multi", "i", "o", {"style": ["0.3,0.7"], "size": ["512"]}) == \
        "i\to\t0.3,0.7\t512"
    assert b("video", "i", "o", {"stream": ["cam1"]}) == "i\to\tcam1"
    assert b("video", "i", "o", {}) == "i\to\t0"
    assert b("gatys", "i", "o", {"style": ["s.png"]}) == "i\ts.png\to"


def test_build_request_line_rejections():
    with pytest.raises(ValueError, match="style"):
        httpserve.build_request_line("gatys", "i", "o", {})
    with pytest.raises(ValueError, match="tabs"):
        httpserve.build_request_line(
            "multi", "i", "o", {"style": ["0\tinjected"]})


def test_stats_to_json():
    payload = "ok=12 err=1 p50_ms=4.2 latency=group-amortized"
    d = json.loads(httpserve._stats_to_json(payload))
    assert d == {"ok": 12, "err": 1, "p50_ms": 4.2,
                 "latency": "group-amortized"}


def test_stats_to_prometheus():
    payload = ("ok=12 err=1 p50_ms=4.0 p95_ms=9.0 mean_ms=5.0 "
               "latency=group-amortized mean_batch_fill=3.5")
    text = httpserve._stats_to_prometheus(payload, "fast-http")
    assert ('styletransfer_requests_total{daemon="fast-http",outcome="ok"} 12'
            in text)
    assert ('styletransfer_requests_total{daemon="fast-http",outcome="err"} 1'
            in text)
    # ms -> seconds, pXX -> quantile labels.
    assert ('styletransfer_request_seconds{daemon="fast-http",'
            'quantile="0.5"} 0.004000' in text)
    assert ('styletransfer_request_seconds{daemon="fast-http",'
            'quantile="0.95"} 0.009000' in text)
    # sum = mean * count, count = ok + err.
    assert 'styletransfer_request_seconds_sum{daemon="fast-http"} 0.065000' \
        in text
    assert 'styletransfer_request_seconds_count{daemon="fast-http"} 13' \
        in text
    assert 'styletransfer_batch_fill_mean{daemon="fast-http"} 3.5' in text
    # Exposition format: every non-comment line is NAME{labels} VALUE.
    for line in text.strip().splitlines():
        if not line.startswith("#"):
            assert line.startswith("styletransfer_"), line
            assert len(line.rsplit(" ", 1)) == 2, line


def test_stats_to_prometheus_amortized_summary():
    """Batched-mode STATS payloads export the group-amortized secondary
    metric as its own summary, alongside the primary enqueue-to-reply
    one — neither's quantile parsing collides with the other."""
    payload = ("ok=8 err=0 p50_ms=50.0 p95_ms=60.0 mean_ms=52.0 "
               "latency=enqueue-to-reply amort_mean_ms=13.0 "
               "amort_p50_ms=12.0 mean_batch_fill=4.0")
    text = httpserve._stats_to_prometheus(payload, "t")
    assert ('styletransfer_request_seconds{daemon="t",quantile="0.5"} '
            "0.050000" in text)
    assert ('styletransfer_request_amortized_seconds{daemon="t",'
            'quantile="0.5"} 0.012000' in text)
    assert ('styletransfer_request_amortized_seconds_sum{daemon="t"} '
            "0.104000" in text)
    assert 'styletransfer_request_amortized_seconds_count{daemon="t"} 8' \
        in text
    # The amort quantile must NOT leak into the primary summary.
    assert 'styletransfer_request_seconds{daemon="t",quantile="0.5"} 0.012' \
        not in text
    for line in text.strip().splitlines():
        if not line.startswith("#"):
            assert line.startswith("styletransfer_"), line


def test_stats_to_prometheus_device_rtt_gauge():
    text = httpserve._stats_to_prometheus(
        "ok=1 err=0 p50_ms=5.0 device_rtt_ms=26.4", "t")
    assert ('styletransfer_device_rtt_seconds{daemon="t"} 0.026400'
            in text)


def test_stats_to_prometheus_minimal_payload():
    # A daemon that has served nothing yet reports bare counters.
    text = httpserve._stats_to_prometheus("ok=0 err=0", "t")
    assert 'outcome="ok"} 0' in text
    assert "quantile" not in text


def test_serve_transport_mutual_exclusion():
    with pytest.raises(ValueError, match="mutually exclusive"):
        httpserve.serve_transport(
            lambda i, o: 0, tcp="9999", http="9999", kind="fast", name="x")


def test_serve_over_http_rejects_unknown_kind():
    with pytest.raises(ValueError, match="unknown daemon kind"):
        httpserve.serve_over_http(lambda i, o: 0, kind="nope")


# ---------------------------------------------------------------------------
# End-to-end over real HTTP


def test_healthz_stylize_errors_stats_reload_shutdown():
    gate = threading.Event()
    srv = _Server(_reverse_loop(gate=gate))

    # Before READY: /healthz says compiling; requests queue (don't send
    # one here — it would block the thread until the gate opens).
    status, _, body = srv.request("/healthz")
    assert status == 503 and b"compiling" in body

    gate.set()
    # READY reaches the real stdout and flips /healthz.
    for _ in range(100):
        status, _, _ = srv.request("/healthz")
        if status == 200:
            break
    assert status == 200
    assert "READY" in srv.stdout.getvalue()

    # Round-trip: body in, reversed bytes out, image/png content type.
    status, headers, body = srv.request(
        "/v1/stylize", data=b"pixels!", method="POST")
    assert status == 200, body
    assert body == b"!slexip"
    assert headers["Content-Type"] == "image/png"

    # Engine-side failure maps to 422 with the reason.
    status, _, body = srv.request("/v1/stylize", data=b"BOOM", method="POST")
    assert status == 422 and b"bad image payload" in body

    # Gateway-side 400: tab smuggling in a query param.
    status, _, body = srv.request(
        "/v1/stylize?size=5%09injected", data=b"x", method="POST")
    assert status == 400 and b"tabs" in body

    # Unknown routes.
    assert srv.request("/nope")[0] == 404
    assert srv.request("/nope", data=b"", method="POST")[0] == 404

    # Stats: text and JSON forms, served in-band by the engine loop.
    status, _, body = srv.request("/stats")
    assert status == 200 and b"ok=" in body
    status, headers, body = srv.request("/stats?format=json")
    assert status == 200
    assert headers["Content-Type"] == "application/json"
    stats = json.loads(body)
    assert stats["ok"] >= 1 and stats["err"] >= 1

    # Prometheus exposition rides the same in-band STATS.
    status, headers, body = srv.request("/metrics")
    assert status == 200
    assert headers["Content-Type"].startswith("text/plain; version=0.0.4")
    text = body.decode()
    assert 'styletransfer_requests_total{daemon="t",outcome="ok"} 1' in text
    assert 'styletransfer_requests_total{daemon="t",outcome="err"} 1' in text

    # RELOAD routes through the loop's command table.
    status, _, body = srv.request("/reload", data=b"", method="POST")
    assert status == 200 and b"epoch=7" in body

    # /reset is video-only.
    assert srv.request("/reset", data=b"", method="POST")[0] == 404

    # Clean shutdown: ack 200, loop returns, late requests answer 503.
    status, _, body = srv.request("/shutdown", data=b"", method="POST")
    assert status == 200
    srv.join()
    assert srv.result == 1  # the one successful stylize request


def test_shutdown_refuses_connections():
    srv = _Server(_reverse_loop())
    srv.request("/shutdown", data=b"", method="POST")
    srv.join()
    with pytest.raises(urllib.error.URLError):
        urllib.request.urlopen(srv.url("/healthz"), timeout=5)


def test_body_error_closes_keepalive_connection():
    """A 413/411 reply leaves the request body unread on the socket; on a
    keep-alive connection those bytes would be parsed as the next request
    line (a permanently desynchronized connection). The gateway must
    answer ``Connection: close`` and actually close, so the client's
    unread body dies with the connection instead of poisoning it."""
    import socket

    srv = _Server(_reverse_loop())
    try:
        with socket.create_connection(("127.0.0.1", srv.port), timeout=10) as s:
            s.sendall(
                b"POST /v1/stylize HTTP/1.1\r\n"
                b"Host: t\r\n"
                b"Content-Length: 99999999999\r\n"
                b"\r\n"
                b"these-body-bytes-would-poison-a-kept-alive-connection"
            )
            s.settimeout(10)
            resp = b""
            while b"\r\n\r\n" not in resp:
                chunk = s.recv(4096)
                if not chunk:
                    break
                resp += chunk
            head = resp.split(b"\r\n\r\n", 1)[0].decode("latin-1").lower()
            assert " 413 " in head.splitlines()[0]
            assert "connection: close" in head
            # The server closes after the response: drain to EOF rather
            # than parsing our stray body bytes as a second request.
            while True:
                chunk = s.recv(4096)
                if not chunk:
                    break
    finally:
        srv.request("/shutdown", data=b"", method="POST")
        srv.join()


def test_spool_files_cleaned_up():
    import tempfile
    import time

    tmp = tempfile.gettempdir()

    def spool_dirs():
        return {os.path.join(tmp, d) for d in os.listdir(tmp)
                if d.startswith("stx-spooltest-")}

    before = spool_dirs()
    srv = _Server(_reverse_loop(), name="spooltest")
    status, _, _ = srv.request("/v1/stylize", data=b"abc", method="POST")
    assert status == 200
    mine = spool_dirs() - before
    assert mine, "spool dir was never created"
    # Per-request temp files are deleted once the response is sent; the
    # handler's cleanup runs after the client already has the bytes, so
    # poll briefly.
    deadline = time.time() + 10
    while time.time() < deadline:
        leftovers = {d: os.listdir(d) for d in mine if os.path.isdir(d)}
        if all(not files for files in leftovers.values()):
            break
        time.sleep(0.05)
    assert all(not files for files in leftovers.values()), leftovers
    srv.request("/shutdown", data=b"", method="POST")
    srv.join()
    # The spool dir itself is removed at shutdown.
    assert not any(os.path.isdir(d) for d in mine)


def test_gatys_kind_loss_header_and_style_param():
    seen = []

    def payload(out_path):
        return f"{out_path} loss=1.2345"

    def run_loop(stdin, stdout):
        def handle(*fields):
            seen.append(fields)
            content, style, out = fields
            with open(content, "rb") as f:
                data = f.read()
            with open(out, "wb") as f:
                f.write(data[::-1])
            return payload(out)

        print("READY", file=stdout, flush=True)
        return daemon.run_request_loop(handle, stdin=stdin, stdout=stdout)

    srv = _Server(run_loop, kind="gatys")
    # Missing style is a 400 before the engine sees anything.
    status, _, body = srv.request("/v1/stylize", data=b"c", method="POST")
    assert status == 400 and b"style" in body
    status, headers, body = srv.request(
        "/v1/stylize?style=styles/a.png,styles/b.png:0.3,0.7",
        data=b"content", method="POST")
    assert status == 200
    assert body == b"tnetnoc"
    assert headers["X-Final-Loss"] == "1.2345"
    assert seen[0][1] == "styles/a.png,styles/b.png:0.3,0.7"
    srv.request("/shutdown", data=b"", method="POST")
    srv.join()


def test_video_kind_stream_routing_and_reset():
    seen = []

    def run_loop(stdin, stdout):
        def handle(*fields):
            seen.append(fields)
            if fields[0] == "RESET":
                sid = fields[2] if len(fields) > 2 else ""
                return f"RESET {sid}" if sid else "RESET"
            in_path, out_path, sid = fields[0], fields[1], fields[2]
            with open(out_path, "wb") as f:
                f.write(sid.encode())
            return out_path

        print("READY", file=stdout, flush=True)
        return daemon.run_request_loop(handle, stdin=stdin, stdout=stdout)

    srv = _Server(run_loop, kind="video")
    status, _, body = srv.request(
        "/v1/stylize?stream=cam7", data=b"f", method="POST")
    assert status == 200 and body == b"cam7"
    status, _, body = srv.request("/v1/stylize", data=b"f", method="POST")
    assert status == 200 and body == b"0"  # default stream

    # Targeted and global resets build the documented line shapes.
    status, _, body = srv.request("/reset?stream=cam7", data=b"", method="POST")
    assert status == 200 and b"RESET cam7" in body
    status, _, body = srv.request("/reset", data=b"", method="POST")
    assert status == 200 and body.strip() == b"RESET"
    assert ("RESET", "", "cam7") in seen
    assert ("RESET",) in seen
    srv.request("/shutdown", data=b"", method="POST")
    srv.join()


def test_batched_loop_routes_concurrent_requests():
    """Concurrent HTTP requests reach a BATCHED loop and each response
    routes back to its own requester — the cross-connection dynamic
    batching story."""
    barrier = threading.Barrier(4, timeout=30)

    def run_loop(stdin, stdout):
        def handle_batch(requests):
            out = []
            for fields in requests:
                with open(fields[0], "rb") as f:
                    data = f.read()
                with open(fields[1], "wb") as f:
                    f.write(data[::-1])
                out.append(fields[1])
            return out

        print("READY", file=stdout, flush=True)
        return daemon.run_batched_request_loop(
            handle_batch, max_batch=8, stdin=stdin, stdout=stdout)

    srv = _Server(run_loop)
    results = {}

    def post(i):
        barrier.wait()
        payload = f"payload-{i}".encode()
        status, _, body = srv.request(
            "/v1/stylize", data=payload, method="POST")
        results[i] = (status, body)

    threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    assert len(results) == 4
    for i, (status, body) in results.items():
        assert status == 200
        assert body == f"payload-{i}".encode()[::-1]
    srv.request("/shutdown", data=b"", method="POST")
    srv.join()
    assert srv.result == 4


def test_no_body_post_routes_drain_keepalive_body():
    """POST routes that don't use the body (/reload, unknown) must still
    consume a declared body: unread bytes on a keep-alive connection get
    parsed as the next request line, desynchronizing every later request
    on that connection."""
    import socket as socket_mod

    srv = _Server(_reverse_loop())
    try:
        with socket_mod.create_connection(("127.0.0.1", srv.port),
                                          timeout=10) as s:
            s.settimeout(10)

            def roundtrip(req: bytes) -> bytes:
                s.sendall(req)
                resp = b""
                while b"\r\n\r\n" not in resp:
                    chunk = s.recv(4096)
                    assert chunk, "connection closed unexpectedly"
                    resp += chunk
                head, rest = resp.split(b"\r\n\r\n", 1)
                length = 0
                for line in head.split(b"\r\n"):
                    if line.lower().startswith(b"content-length:"):
                        length = int(line.split(b":")[1])
                while len(rest) < length:
                    rest += s.recv(4096)
                return head

            # 1) POST /reload WITH a body (e.g. curl -d x) on keep-alive.
            head = roundtrip(
                b"POST /reload HTTP/1.1\r\nHost: t\r\n"
                b"Content-Length: 5\r\n\r\nxxxxx"
            )
            assert b" 200 " in head.splitlines()[0]

            # 2) The SAME connection must still answer correctly — the
            # body bytes were drained, not parsed as a request line.
            head = roundtrip(b"GET /healthz HTTP/1.1\r\nHost: t\r\n\r\n")
            assert b" 200 " in head.splitlines()[0]

            # 3) Unknown POST route with a body: drained the same way.
            head = roundtrip(
                b"POST /nope HTTP/1.1\r\nHost: t\r\n"
                b"Content-Length: 3\r\n\r\nabc"
            )
            assert b" 404 " in head.splitlines()[0]
            head = roundtrip(b"GET /healthz HTTP/1.1\r\nHost: t\r\n\r\n")
            assert b" 200 " in head.splitlines()[0]

        # Negative Content-Length must answer 400, never hang the
        # handler reading to EOF.
        with socket_mod.create_connection(("127.0.0.1", srv.port),
                                          timeout=10) as s:
            s.settimeout(10)
            s.sendall(
                b"POST /v1/stylize HTTP/1.1\r\nHost: t\r\n"
                b"Content-Length: -1\r\n\r\n"
            )
            resp = b""
            while b"\r\n\r\n" not in resp:
                chunk = s.recv(4096)
                if not chunk:
                    break
                resp += chunk
            assert b" 400 " in resp.splitlines()[0]
    finally:
        srv.request("/shutdown", data=b"", method="POST")
        srv.join()
