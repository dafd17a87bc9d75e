"""Protocol robustness fuzz: hostile bytes must never break the one
invariant everything rides on.

Both the FIFO response routing of the TCP transport (engines/netserve.py)
and every pipe-counting client depend on: EXACTLY one ``OK``/``ERR`` line
per consumed request line, in consume order, and the daemon never dies
mid-session. These tests throw randomized garbage (TAB storms, interior
blanks, unicode, control bytes, command look-alikes, 10k-char lines) at
both shared loops with a handler that fails on half of it, and at a real
serve loop, asserting the response count/order contract and survival.

Seeded RNG: failures reproduce exactly.
"""

import io
import random

from styletransfer_tpu.engines import daemon


def _garbage_lines(rng, n):
    alphabet = (
        "abc/\\.. xyz0123456789",
        "\t\t\t",
        "éü漢字🎨",
        "RESET RELOAD STATS SHUTDOWN OK ERR READY",
        "\x00\x01\x1b[31m",
    )
    lines = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randrange(1, 5)):
            src = rng.choice(alphabet)
            parts.append("".join(rng.choice(src)
                                 for _ in range(rng.randrange(0, 12))))
        line = "\t".join(parts)
        if rng.random() < 0.05:
            line = line + "x" * 10_000  # oversized request
        # Never a line the loop treats as shutdown (leading content only).
        if not line.strip():
            line = "x" + line
        lines.append(line)
    return lines


def test_fuzz_serial_loop_one_response_per_line():
    rng = random.Random(0)
    lines = _garbage_lines(rng, 300)

    def handle(*fields):
        if len(fields) > 2 or not fields[0].isascii():
            raise ValueError("nope \n multi\nline \t reason")
        return f"ok:{fields[0][:20]}"

    stdin = io.StringIO("\n".join(lines) + "\n\n")
    stdout = io.StringIO()
    daemon.run_request_loop(handle, stdin=stdin, stdout=stdout, name="fuzz")
    out = stdout.getvalue().splitlines()
    # STATS lines in the garbage are answered by the loop itself; every
    # other line gets exactly one OK/ERR — and ERR reasons are collapsed
    # to one line, so the count matches exactly.
    assert len(out) == len(lines)
    for resp in out:
        assert resp.startswith(("OK ", "ERR ")), resp[:80]


def test_fuzz_batched_loop_one_response_per_line_in_order():
    rng = random.Random(1)
    lines = _garbage_lines(rng, 300)

    def handle_batch(requests):
        results = []
        for fields in requests:
            if len(fields) % 2:
                results.append(ValueError("odd\nfields"))
            else:
                results.append("+".join(fields)[:30])
        return results

    stdin = io.StringIO("\n".join(lines) + "\n\n")
    stdout = io.StringIO()
    daemon.run_batched_request_loop(
        handle_batch, max_batch=7, stdin=stdin, stdout=stdout, name="fuzz"
    )
    out = stdout.getvalue().splitlines()
    assert len(out) == len(lines)
    # Order: response k must correspond to request k (echo check where
    # the handler succeeded — ERR lines echo the first field).
    for line, resp in zip(lines, out):
        assert resp.startswith(("OK ", "ERR ")), resp[:80]
        fields = daemon.split_fields(line)
        if fields == ["STATS"]:
            assert resp.startswith("OK STATS")
        elif resp.startswith("ERR "):
            # One line per response even for multi-line exception text.
            assert "\n" not in resp


def test_fuzz_real_fast_daemon_survives(tmp_path, rng):
    """The real fast_st serve loop (batched) over garbage + one valid
    request: every line answered, daemon alive to serve the valid one."""
    import jax
    import numpy as np
    from PIL import Image

    from styletransfer_tpu.engines import fast
    from styletransfer_tpu.models import transformer

    img = tmp_path / "p.png"
    Image.fromarray(
        rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    ).save(img)
    params = transformer.init_params(jax.random.PRNGKey(0))

    garbage = _garbage_lines(random.Random(2), 40)
    lines = garbage + [f"{img}\t{tmp_path}/ok.png"]
    stdin = io.StringIO("\n".join(lines) + "\n\n")
    stdout = io.StringIO()
    fast.serve_loop(
        style_name="tst", out_dir=str(tmp_path / "results"), params=params,
        size=32, batch_size=3, stdin=stdin, stdout=stdout,
    )
    out = stdout.getvalue().splitlines()
    assert out[0] == "READY"
    assert len(out) == 1 + len(lines)
    assert out[-1] == f"OK {tmp_path}/ok.png"
