"""Profiling & observability: stage timers + jax.profiler trace capture.

The reference's only progress visibility is tqdm bars around Python loops
(`SURVEY.md` §5); here every pipeline stage can be timed (wall clock +
frames/sec) and whole runs captured as XLA profiler traces for tensorboard.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import OrderedDict


@dataclasses.dataclass
class StageStat:
    calls: int = 0
    total_s: float = 0.0
    items: int = 0

    @property
    def mean_s(self) -> float:
        return self.total_s / self.calls if self.calls else 0.0

    @property
    def items_per_s(self) -> float:
        return self.items / self.total_s if self.total_s > 0 else 0.0


class StageProfiler:
    """Accumulates wall-clock per named stage; prints a summary table."""

    def __init__(self) -> None:
        self.stages: "OrderedDict[str, StageStat]" = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        stat = self.stages.setdefault(name, StageStat())
        t0 = time.perf_counter()
        try:
            yield
        finally:
            stat.calls += 1
            stat.total_s += time.perf_counter() - t0
            stat.items += items

    def summary(self) -> str:
        lines = [f"{'stage':<28}{'calls':>7}{'total s':>10}{'mean s':>10}"
                 f"{'items/s':>12}"]
        for name, s in self.stages.items():
            rate = f"{s.items_per_s:.2f}" if s.items else "-"
            lines.append(
                f"{name:<28}{s.calls:>7}{s.total_s:>10.3f}{s.mean_s:>10.4f}"
                f"{rate:>12}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(log_dir: str | None):
    """Capture a jax.profiler trace (viewable in tensorboard) when log_dir
    is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync():
    """Block until all dispatched device work completes (for honest timing)."""
    import jax

    (jax.device_put(0.0) + 0.0).block_until_ready()
