"""Timing and profiling helpers.

The reference instruments solves with ad-hoc ``time.time()`` spans stored in
``solve_info``/``iter_data`` (``DGSQP.py:233,261,349,443``).  Here the same wall-clock spans
are available as a context manager, plus a jax profiler trace wrapper for real device
timelines (``jax.profiler.trace`` -> TensorBoard/XProf) — the TPU-native upgrade of the
reference's print-based timing.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class Timers:
    """Named wall-clock accumulators: ``with timers.span('qp'): ...``."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {k: dict(total_s=self.totals[k], count=self.counts[k],
                        mean_s=self.totals[k] / max(self.counts[k], 1))
                for k in sorted(self.totals)}


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Wrap a region in a jax profiler trace (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


def block_and_time(fn, *args, **kwargs):
    """Run a jitted fn, block on its outputs, return (result, seconds)."""
    import jax
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0
