"""Tracing / profiling helpers.

The reference has no profiling beyond tqdm bars (SURVEY.md §5). TPU-native
equivalents: ``jax.profiler`` trace capture around training regions (viewable
in TensorBoard/Perfetto/XProf) plus a lightweight step timer that reports
steady-state throughput excluding compile.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

from styletransfer_tpu.utils.logging import get_logger


@contextlib.contextmanager
def trace(logdir: str = "runs/profile") -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region.

    View with TensorBoard's profile plugin or Perfetto
    (``jax.profiler.trace`` writes both formats).
    """
    import jax

    with jax.profiler.trace(logdir):
        yield
    get_logger().info("Profiler trace written to %s", logdir)


class StepTimer:
    """Steady-state throughput meter that skips warmup (compile) steps.

    >>> timer = StepTimer(items_per_step=batch_size, skip=2)
    >>> for batch in loader:
    ...     train_step(...)
    ...     timer.step()
    >>> timer.summary()  # -> "1234.5 items/s over 98 steps"
    """

    def __init__(self, items_per_step: int = 1, skip: int = 2):
        self.items_per_step = items_per_step
        self.skip = skip
        self._count = 0
        # skip=0 means "time every step": the clock starts at
        # construction (create the timer right before the loop), since
        # there is no completed warmup step to anchor it to — previously
        # skip=0 never started the clock and rate() was NaN forever.
        self._t0: Optional[float] = (
            time.perf_counter() if skip == 0 else None
        )

    def step(self) -> None:
        self._count += 1
        if self._count == self.skip:
            self._t0 = time.perf_counter()

    @property
    def timed_steps(self) -> int:
        return max(0, self._count - self.skip)

    def rate(self) -> float:
        """Items/sec over the timed region (nan until enough steps)."""
        if self._t0 is None or self.timed_steps == 0:
            return float("nan")
        return self.timed_steps * self.items_per_step / (time.perf_counter() - self._t0)

    def summary(self) -> str:
        return f"{self.rate():.1f} items/s over {self.timed_steps} steps"
