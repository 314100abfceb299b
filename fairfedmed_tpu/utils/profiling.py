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


_last_stamp: List[float] = []
_heartbeat: List[float] = [time.monotonic()]


def heartbeat() -> None:
    """Record forward progress (cheap, unconditional).  The tunnel poker
    (utils/tunnel.py) treats a stale heartbeat as a wedged remote-TPU
    attachment and pokes the relay."""
    _heartbeat[0] = time.monotonic()


def heartbeat_age() -> float:
    return time.monotonic() - _heartbeat[0]


def stamp(label: str) -> None:
    """One-off phase stamp on STDERR (stdout is contract-bound: the CLI's
    stdout is golden-pinned and the bench parses its JSON line).  Prints the
    delta since the previous stamp — used to localize remote-TPU tunnel
    stalls, which block with ~0 CPU and no log output.  Enabled by
    FAIRFEDMED_TIMING=1 (which also turns on the per-round fenced timers —
    ~5% round-rate cost) or FAIRFEDMED_BUILD_STAMPS=1 (stamps only, free:
    they run once at startup, never inside the measured rounds)."""
    import os
    import sys

    heartbeat()  # every stamp site is a progress milestone for the poker
    if os.environ.get("FAIRFEDMED_TIMING") != "1" \
            and os.environ.get("FAIRFEDMED_BUILD_STAMPS") != "1":
        return
    now = time.perf_counter()
    delta = f" +{now - _last_stamp[-1]:.1f}s" if _last_stamp else ""
    _last_stamp[:] = [now]
    print(f"[timing] {label}{delta}", file=sys.stderr, flush=True)


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
