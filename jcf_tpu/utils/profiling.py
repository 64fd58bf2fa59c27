"""Profiling hooks: wall-clock timers and jax.profiler traces
(SURVEY.md §5 — the reference has no tracing; tqdm only)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


class Timer:
    """Accumulating phase timer; blocks on device work for honest numbers."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            name: {"total_s": t, "count": self.counts[name], "mean_s": t / self.counts[name]}
            for name, t in self.totals.items()
        }


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when a directory is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
