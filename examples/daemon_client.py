"""Minimal reference client for the warm-process serving daemons.

Spawns one of the `serve` CLIs (`fast_st serve`, `fast_st serve-multi`,
`video_st serve`, `gatys_st --serve` — docs/serving.md), waits for
`READY`, streams requests
from the command line (or stdin with `-`), and prints one response per
request. Exits non-zero if any request failed.

Examples:

    python examples/daemon_client.py fast demo_style.png img1.jpg img2.jpg
    python examples/daemon_client.py video demo_style.png frame*.png
    python examples/daemon_client.py multi mymodel --num-styles 3 \
        --style 0.5,0.5,0 img.jpg
    ls photos/*.jpg | python examples/daemon_client.py fast demo_style.png -
    python examples/daemon_client.py gatys data/styles/demo_style.png \
        --steps 40 photo1.jpg photo2.jpg
    # against a daemon started with --tcp (shared by many clients):
    python examples/daemon_client.py fast demo_style.png \
        --tcp 127.0.0.1:7000 img1.jpg img2.jpg

The protocol is plain line-oriented text over pipes or TCP (`--tcp`,
docs/serving.md), so this file is intentionally dependency-free.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("mode", choices=["fast", "multi", "video", "gatys"])
    ap.add_argument("style_name",
                    help="style / model name of the checkpoint "
                         "(gatys: path of the style image itself)")
    ap.add_argument("inputs", nargs="+",
                    help="input image/frame paths, or '-' to read from stdin")
    ap.add_argument("--num-styles", type=int,
                    help="(multi) number of styles in the checkpoint")
    ap.add_argument("--style", default=None,
                    help="(multi) style index or comma-separated blend "
                         "weights applied to every request")
    ap.add_argument("--req-size", type=int, default=None,
                    help="(fast/multi) per-request resolution bucket — the "
                         "SIZE protocol field; the daemon must have been "
                         "started with --sizes listing it")
    ap.add_argument("--precision", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--batch", type=int, default=1,
                    help="(fast/multi/gatys) dynamic-batching group size on "
                         "the daemon side — piped bursts serve one group "
                         "per device call")
    ap.add_argument("--steps", type=int, default=300,
                    help="(gatys) optimization steps per request "
                         "(compiled into the daemon)")
    ap.add_argument("--optimizer", default=None,
                    choices=["adam", "lbfgs", "lbfgs-zoom"],
                    help="(gatys) daemon optimizer — adam/lbfgs-zoom give "
                         "near-linear batched throughput")
    ap.add_argument("--tcp", default=None, metavar="HOST:PORT",
                    help="connect to an ALREADY-RUNNING daemon's TCP "
                         "listener (started with --tcp) instead of spawning "
                         "one; daemon-side options (--steps, --batch, "
                         "--precision) are then fixed by that daemon. With "
                         "--batch > 1 requests are still pipelined "
                         "client-side so the daemon can group them.")
    args = ap.parse_args()

    cmd = [sys.executable, "-m", "styletransfer_tpu"]
    if args.mode == "fast":
        cmd += ["fast_st", "serve", args.style_name]
    elif args.mode == "multi":
        if args.num_styles is None:
            ap.error("--num-styles is required for multi")
        cmd += ["fast_st", "serve-multi", args.style_name,
                "--num-styles", str(args.num_styles)]
    elif args.mode == "gatys":
        cmd += ["gatys_st", "--serve", "--steps", str(args.steps)]
        if args.optimizer:
            cmd += ["--optimizer", args.optimizer]
    else:
        cmd += ["video_st", "serve", args.style_name]
    cmd += ["--precision", args.precision]
    if args.req_size is not None and args.mode in ("fast", "multi"):
        # Spawned daemons must compile the requested bucket; against an
        # already-running daemon (--tcp) its --sizes list is in charge.
        cmd += ["--sizes", str(args.req_size)]
    if args.batch > 1:
        if args.mode == "video":
            # The daemon CAN batch across different streams (video_st serve
            # -b N + a STREAM field), but this client feeds ONE stream of
            # sequential frames — same-stream requests serialize anyway.
            ap.error("--batch applies to fast/multi/gatys only (this client "
                     "streams one video; cross-stream batching needs the "
                     "daemon's STREAM field)")
        cmd += ["-b" if args.mode == "gatys" else "--batch-size",
                str(args.batch)]

    if args.tcp is not None:
        import socket

        host, _, port = args.tcp.rpartition(":")
        sock = socket.create_connection((host or "127.0.0.1", int(port)),
                                        timeout=600)
        proc = None
        req_w = sock.makefile("w", encoding="utf-8", buffering=1)
        resp_r = sock.makefile("r", encoding="utf-8")
    else:
        proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True, bufsize=1,
        )
        req_w, resp_r = proc.stdin, proc.stdout
    t0 = time.time()
    line = ""
    while line.strip() != "READY":
        line = resp_r.readline()
        if not line:
            print("daemon exited before READY", file=sys.stderr)
            return 2
    print(f"READY in {time.time() - t0:.1f}s", file=sys.stderr)

    inputs = args.inputs
    if inputs == ["-"]:
        inputs = [l.strip() for l in sys.stdin if l.strip()]

    def request_line(path: str) -> str:
        if args.mode == "multi" and (args.style is not None
                                     or args.req_size is not None):
            line = f"{path}\t\t{args.style if args.style is not None else '0'}"
            return f"{line}\t{args.req_size}" if args.req_size else line
        if args.mode == "gatys":
            return f"{path}\t{args.style_name}"
        if args.mode == "fast" and args.req_size is not None:
            return f"{path}\t\t{args.req_size}"
        return path

    failures = 0
    t0 = time.time()
    try:
        if args.batch > 1:
            # Pipeline: send everything up front so the daemon can drain
            # multi-request groups; responses come back one line per
            # request, in order.
            for path in inputs:
                req_w.write(request_line(path) + "\n")
            req_w.flush()
            for _ in inputs:
                resp = resp_r.readline().strip()
                if not resp:  # daemon died mid-burst
                    raise BrokenPipeError("daemon closed its stdout")
                print(resp)
                failures += not resp.startswith("OK")
        else:
            for path in inputs:
                req_w.write(request_line(path) + "\n")
                req_w.flush()
                resp = resp_r.readline().strip()
                if not resp:
                    raise BrokenPipeError("daemon closed its stdout")
                print(resp)
                failures += not resp.startswith("OK")
    except (BrokenPipeError, OSError) as exc:
        print(f"daemon died mid-session: {exc}", file=sys.stderr)
        return 2
    dt = time.time() - t0
    print(
        f"{len(inputs)} request(s) in {dt:.2f}s"
        f" ({dt / max(len(inputs), 1) * 1e3:.0f} ms each), {failures} failed",
        file=sys.stderr,
    )

    try:
        # Blank line: clean shutdown of a spawned daemon; over TCP it only
        # closes this connection — the shared daemon keeps serving others.
        req_w.write("\n")
        req_w.flush()
    except (BrokenPipeError, OSError):
        pass  # daemon already gone; nothing to shut down
    if proc is not None:
        proc.wait(timeout=60)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
