"""Tests for the driver entry points and profiling utilities."""

import sys

import jax
import numpy as np


def test_entry_compiles_and_runs():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally


def test_step_timer():
    from styletransfer_tpu.utils.profiling import StepTimer

    t = StepTimer(items_per_step=4, skip=1)
    assert np.isnan(t.rate())
    for _ in range(5):
        t.step()
    assert t.timed_steps == 4
    assert t.rate() > 0
    assert "items/s" in t.summary()
