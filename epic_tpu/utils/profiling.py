"""Tracing/profiling hooks.

Reference behavior: ad-hoc time.time() deltas around epochs and
encode/decode (SURVEY.md §5). TPU-native upgrade: jax.profiler traces
(viewable in TensorBoard/XProf) plus lightweight named host timers; the
per-quality-level decode time — the paper's headline claim — is measured
in codec.progressive and training.evaluate.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class Timers:
    """Named accumulating host timers."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1000 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sec_to_hours(seconds: float) -> str:
    """Human-readable duration (reference: functions.py:179-186)."""
    h = int(seconds // 3600)
    m = int((seconds % 3600) // 60)
    s = round((seconds % 3600) % 60, 2)
    return f"{h} hours {m} mins {s} seconds"
