"""TCP serving transport tests (engines/netserve.py).

The transport's whole correctness story is one invariant — every engine
loop answers exactly one response line per consumed request line, in
consume order — so these tests drive `serve_over_tcp` with REAL sockets
over fake engine loops (the real loops are pinned separately in
test_engines.py / test_daemon_e2e.py) and check the routing consequences:
per-client response ordering, READY handshakes on both sides of compile,
per-connection goodbye vs whole-daemon SHUTDOWN, and that a vanished
client's in-flight response is dropped without hurting anyone else.
"""

import io
import socket
import threading
import time

import pytest

from styletransfer_tpu.engines import daemon, netserve


class _Server:
    """serve_over_tcp on a fake loop, in a thread, with the bound port."""

    def __init__(self, run_loop, name="t"):
        self.port = None
        self._port_ready = threading.Event()
        self.result = None
        self.stdout = io.StringIO()

        def on_listen(p):
            self.port = p
            self._port_ready.set()

        def main():
            self.result = netserve.serve_over_tcp(
                run_loop, host="127.0.0.1", port=0, stdout=self.stdout,
                name=name, _on_listen=on_listen,
            )

        self.thread = threading.Thread(target=main, daemon=True)
        self.thread.start()
        assert self._port_ready.wait(10), "listener never bound"

    def join(self, timeout=30):
        self.thread.join(timeout)
        assert not self.thread.is_alive(), "server did not shut down"


class _Client:
    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=10)
        self.sock.settimeout(10)
        self.rfile = self.sock.makefile("r", encoding="utf-8")

    def send(self, line):
        self.sock.sendall((line + "\n").encode())

    def recv(self):
        return self.rfile.readline().rstrip("\n")

    def close(self):
        self.sock.close()


def _serial_loop(handle=None, go=None):
    """A fake engine loop with the real request-loop semantics."""

    def default_handle(*fields):
        if fields[0] == "boom":
            raise ValueError("kapow")
        return "+".join(fields).upper()

    def run(stdin, stdout):
        if go is not None:
            assert go.wait(10)
        print("READY", file=stdout, flush=True)
        return daemon.run_request_loop(
            handle or default_handle, stdin=stdin, stdout=stdout, name="t"
        )

    return run


def test_parse_hostport():
    assert netserve.parse_hostport("7000") == ("127.0.0.1", 7000)
    assert netserve.parse_hostport("0.0.0.0:81") == ("0.0.0.0", 81)
    assert netserve.parse_hostport(":81") == ("127.0.0.1", 81)
    with pytest.raises(ValueError):
        netserve.parse_hostport("nope")
    with pytest.raises(ValueError):
        netserve.parse_hostport("host:99999")


def test_two_clients_routing_goodbye_and_shutdown():
    srv = _Server(_serial_loop())
    c1, c2 = _Client(srv.port), _Client(srv.port)
    assert c1.recv() == "READY" and c2.recv() == "READY"

    c1.send("a")
    assert c1.recv() == "OK A"
    c2.send("b\tc")
    assert c2.recv() == "OK B+C"
    c1.send("boom")
    assert c1.recv() == "ERR boom: kapow"

    # Blank line: c1's goodbye closes ONLY c1; the daemon keeps serving c2.
    c1.send("")
    assert c1.recv() == ""  # EOF on our side of the closed connection
    c2.send("still\there")
    assert c2.recv() == "OK STILL+HERE"

    c2.send("SHUTDOWN")
    assert c2.recv() == "OK SHUTDOWN"
    srv.join()
    assert srv.result == 3  # a, b\tc, still\there (boom was an ERR)
    # The supervisor-facing stdout kept its handshake lines.
    out = srv.stdout.getvalue().splitlines()
    assert out[0].startswith("TCP 127.0.0.1 ") and "READY" in out


def test_ready_reaches_clients_on_both_sides_of_compile():
    go = threading.Event()
    srv = _Server(_serial_loop(go=go))
    early = _Client(srv.port)  # connects while the engine is "compiling"
    time.sleep(0.1)
    go.set()
    assert early.recv() == "READY"  # broadcast when the engine came up
    late = _Client(srv.port)  # connects after READY: greeted on accept
    assert late.recv() == "READY"
    late.send("x")
    assert late.recv() == "OK X"
    late.send("SHUTDOWN")
    assert late.recv() == "OK SHUTDOWN"
    srv.join()


def test_batched_loop_routes_across_clients():
    """Interleaved bursts from two clients through a batched engine loop:
    every response must reach its own sender, in that client's order —
    regardless of how the loop grouped the lines into device calls."""

    def handle_batch(requests):
        return ["+".join(fields).upper() for fields in requests]

    go = threading.Event()

    def run(stdin, stdout):
        assert go.wait(10)
        print("READY", file=stdout, flush=True)
        return daemon.run_batched_request_loop(
            handle_batch, max_batch=4, stdin=stdin, stdout=stdout, name="t"
        )

    srv = _Server(run)
    c1, c2 = _Client(srv.port), _Client(srv.port)
    # Queue interleaved bursts BEFORE the loop starts consuming, so at
    # least the first device call covers lines from both clients.
    for i in range(3):
        c1.send(f"a{i}")
        c2.send(f"b{i}")
    go.set()
    assert c1.recv() == "READY" and c2.recv() == "READY"
    assert [c1.recv() for _ in range(3)] == ["OK A0", "OK A1", "OK A2"]
    assert [c2.recv() for _ in range(3)] == ["OK B0", "OK B1", "OK B2"]
    c1.send("SHUTDOWN")
    assert c1.recv() == "OK SHUTDOWN"
    srv.join()
    assert srv.result == 6


def test_goodbye_and_shutdown_wait_for_owed_responses():
    """Graceful close: a client that pipelines requests and its goodbye
    (or SHUTDOWN) in one write still receives every owed response — and
    the SHUTDOWN ack arrives AFTER them, preserving count-pairing."""
    started = threading.Event()

    def slow_handle(*fields):
        started.set()
        time.sleep(0.2)
        return fields[0].upper()

    # Blank-line goodbye pipelined behind a request.
    srv = _Server(_serial_loop(handle=slow_handle))
    c1 = _Client(srv.port)
    assert c1.recv() == "READY"
    c1.sock.sendall(b"gone\n\n")  # request + goodbye in one segment
    assert c1.recv() == "OK GONE"  # delivered before the close
    assert c1.recv() == ""  # then EOF

    # SHUTDOWN pipelined behind a request: ack comes after the response.
    c2 = _Client(srv.port)
    assert c2.recv() == "READY"
    c2.sock.sendall(b"last\nSHUTDOWN\n")
    assert c2.recv() == "OK LAST"
    assert c2.recv() == "OK SHUTDOWN"
    assert c2.recv() == ""
    srv.join()
    assert srv.result == 2


def test_vanished_client_response_dropped_others_survive():
    started = threading.Event()

    def slow_handle(*fields):
        started.set()
        time.sleep(0.3)  # long enough for the sender to vanish
        return fields[0].upper()

    srv = _Server(_serial_loop(handle=slow_handle))
    c1 = _Client(srv.port)
    assert c1.recv() == "READY"
    c1.send("gone")
    assert started.wait(10)
    c1.close()  # vanish with the response in flight

    c2 = _Client(srv.port)
    assert c2.recv() == "READY"
    c2.send("alive")
    assert c2.recv() == "OK ALIVE"
    c2.send("SHUTDOWN")
    assert c2.recv() == "OK SHUTDOWN"
    srv.join()
    assert srv.result == 2  # both handled; one response had nowhere to go


def test_slow_reader_client_does_not_stall_others(monkeypatch):
    """A client that floods requests but never reads its socket must be
    isolated: responses to it queue on ITS writer thread (bounded, then
    it is dropped), while other clients keep being served — the engine
    thread must never block in a send."""
    # Small bounds so the test trips them fast: 64 KB responses fill the
    # loopback send buffer in a few lines; queue of 4; 1 s death timeout.
    monkeypatch.setattr(netserve._Client, "SEND_QUEUE", 4)
    monkeypatch.setattr(netserve._Client, "SEND_TIMEOUT_S", 1.0)

    big = "X" * 65536

    def handle(*fields):
        return big if fields[0] == "big" else fields[0].upper()

    srv = _Server(_serial_loop(handle=handle))
    slow = _Client(srv.port)
    assert slow.recv() == "READY"
    fast = _Client(srv.port)
    assert fast.recv() == "READY"

    # The slow client requests many huge responses and reads NONE of
    # them.
    for _ in range(40):
        slow.send("big")

    # Meanwhile the fast client must keep getting prompt responses
    # through the whole stall-and-drop window.
    deadline = time.time() + 15
    served = 0
    while time.time() < deadline and served < 20:
        fast.send("ping")
        assert fast.recv() == "OK PING"
        served += 1
        time.sleep(0.05)
    assert served == 20, "fast client starved behind a slow reader"

    fast.send("SHUTDOWN")
    assert fast.recv() == "OK SHUTDOWN"
    srv.join()
