"""Unit tests for bench.py's first-dispatch stall watchdog.

The watchdog exists because the round-4 driver artifact recorded a
1378.5 s "first dispatch" with a hot compile cache — a tunnel stall the
record could not distinguish from a cold cache. These tests pin its
three behaviors with fake dispatch functions (no backend needed):
fast path, stall-then-complete (retry de-conflates), and never-completes
(give up WITHOUT piling a concurrent dispatch on a wedged backend).
"""

import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import bench  # noqa: E402  (repo-root module)


def test_fast_dispatch_no_retry():
    calls = []

    def run():
        calls.append(1)

    dt, retries, stalled = bench._watchdogged_first_dispatch(
        run, watchdog_s=1.0, attempts=3
    )
    assert len(calls) == 1
    assert retries == 0 and stalled == 0.0
    assert dt < 1.0


def test_stalled_then_retry_deconflates():
    """First attempt exceeds the watchdog but completes within the hard
    wait; the retry measures the true (now-fast) dispatch, the stall is
    accounted separately."""
    calls = []

    def run():
        calls.append(1)
        if len(calls) == 1:
            time.sleep(0.3)  # stalled first attempt

    import os

    os.environ["BENCH_DISPATCH_HARD_WAIT_S"] = "5"
    try:
        dt, retries, stalled = bench._watchdogged_first_dispatch(
            run, watchdog_s=0.05, attempts=3
        )
    finally:
        del os.environ["BENCH_DISPATCH_HARD_WAIT_S"]
    assert len(calls) == 2
    assert retries == 1
    assert stalled >= 0.3  # the stalled attempt's full wall time
    assert dt < 0.05  # the retry's true dispatch time


def test_wedged_dispatch_gives_up_without_redispatch():
    """A dispatch that never completes within the hard wait must NOT be
    retried (a second in-flight dispatch would contend with the first on
    a wedged backend); the wait is reported as both the dispatch time
    and stalled time."""
    calls = []
    release = time.time() + 60.0

    def run():
        calls.append(1)
        while time.time() < release and len(calls) == 1:
            time.sleep(0.01)

    import os

    os.environ["BENCH_DISPATCH_HARD_WAIT_S"] = "0.1"
    try:
        dt, retries, stalled = bench._watchdogged_first_dispatch(
            run, watchdog_s=0.05, attempts=3
        )
    finally:
        del os.environ["BENCH_DISPATCH_HARD_WAIT_S"]
        calls.append("stop")  # unblock the daemon thread promptly
    assert len([c for c in calls if c == 1]) == 1, "must not re-dispatch"
    assert retries == 0
    assert dt >= 0.15  # watchdog + hard wait
    assert stalled >= 0.15
