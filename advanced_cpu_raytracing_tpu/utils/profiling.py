"""Profiling helpers: wall-clock stage timers + JAX device profiler traces.

The reference's only instrumentation is one steady_clock around the whole
render (src/main.cpp:138, 199-201).  Here every stage can be timed, and a
device trace (viewable in TensorBoard / Perfetto) can wrap any section.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulating per-stage wall-clock timer."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = [
            f"{name:>24s}: {self.totals[name]:8.3f}s x{self.counts[name]}"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """JAX profiler trace around a section (TPU/CPU)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block(tree):
    """Block on a pytree of device arrays (for timing boundaries)."""
    import jax

    jax.block_until_ready(tree)
    return tree
