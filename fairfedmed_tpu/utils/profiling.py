"""Profiling utilities (SURVEY §5: the TPU build subsumes the reference's
wall-clock meters with jax.profiler traces + host timing).

``profile_trace(log_dir)`` wraps a region in a jax.profiler trace viewable in
TensorBoard/Perfetto; ``timed(name)`` is the host-side timer used for
per-round accounting (global_time_list equivalent, federated_main.py:219).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace of the enclosed region; no-op on failure (e.g. a
    backend without profiling support)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:
        print(f"jax.profiler unavailable ({e}); continuing without trace")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"Wrote profiler trace to {log_dir}")
            except Exception as e:
                print(f"profiler stop failed ({e})")


class HostTimers:
    """Named cumulative host timers: ``with timers.timed('round'): ...``."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.laps: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def timed(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.laps[name].append(dt)

    def summary(self) -> str:
        return "  ".join(f"{k}: {v:.2f}s/{len(self.laps[k])}x"
                         for k, v in sorted(self.totals.items()))
