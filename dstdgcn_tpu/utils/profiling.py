"""First-class step timing and XLA profiler hooks.

The reference only has commented-out wall-clock timing around the forward
(``engine/prediction.py:234-241``); here per-step timing and ``jax.profiler``
traces are first-class.  ``StepTimer`` records device-complete step wall
times; ``trace`` wraps ``jax.profiler.trace`` so a training run can dump a
TensorBoard-viewable trace of a few hot steps without code changes (enable
via the ``engine.profile`` config key).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

__all__ = ["StepTimer", "trace"]


class StepTimer:
    """Wall-clock timer for compiled steps.

    Call :meth:`tic` before launching a step and :meth:`toc` after the
    result is device-complete (``block_until_ready``).  The first
    ``skip_first`` steps (compilation) are excluded from the statistics.
    """

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self._times: List[float] = []
        self._seen = 0
        self._t0: Optional[float] = None

    def tic(self) -> None:
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.skip_first:
            self._times.append(dt)
        return dt

    @property
    def steps(self) -> int:
        return len(self._times)

    @property
    def avg_ms(self) -> float:
        return 1e3 * sum(self._times) / max(len(self._times), 1)

    @property
    def steps_per_s(self) -> float:
        tot = sum(self._times)
        return len(self._times) / tot if tot > 0 else 0.0

    def summary(self) -> str:
        if not self._times:
            return "no timed steps"
        lo, hi = min(self._times) * 1e3, max(self._times) * 1e3
        return (f"{self.steps} steps | avg {self.avg_ms:.2f} ms | "
                f"min {lo:.2f} / max {hi:.2f} ms | "
                f"{self.steps_per_s:.2f} steps/s")


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
