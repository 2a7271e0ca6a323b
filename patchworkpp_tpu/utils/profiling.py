"""Profiling / tracing utilities.

The reference instruments its frame with hand-rolled clock() segment timers
printed under `verbose` (reference: cpp/patchworkpp/src/patchworkpp.cpp:179,
:323-333). The TPU equivalents: a host-side frame timer with the same
czm/sort/pca/gle-style breakdown *per jitted region* when run eagerly, and
`jax.profiler` trace capture for on-device kernel timelines.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class FrameTimer:
    """Accumulating named segment timer (getTimeTaken() analog)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.frames = 0

    @contextlib.contextmanager
    def segment(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0

    def tick_frame(self) -> None:
        self.frames += 1

    @property
    def time_taken_us(self) -> float:
        """Total accumulated microseconds (reference getTimeTaken unit)."""
        return sum(self.totals.values()) * 1e6

    def report(self) -> str:
        per_frame = max(self.frames, 1)
        parts = [
            f"{k}: {v / per_frame * 1000:.2f}ms" for k, v in sorted(self.totals.items())
        ]
        return f"frames={self.frames}  " + "  ".join(parts)


@contextlib.contextmanager
def profile_trace(logdir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler device trace around a block (roofline source).

    View with tensorboard or xprof. No-op if profiling is unavailable.
    """
    import jax

    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
