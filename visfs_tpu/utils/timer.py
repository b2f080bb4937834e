"""Stage timers + device profiling hooks (utilite UTimer equivalent).

The reference's UTimer (utilite/src/Timer.cpp) is a wall-clock stopwatch with
``elapsed(tag)`` logging; instrumentation points exist throughout the
pipeline (SURVEY.md §5).  On TPU the analogue must force device completion
before reading the clock, and heavyweight profiling goes through
``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


class StageTimer:
    """Stopwatch that blocks on device work; accumulates per-tag stats."""

    def __init__(self, logger=None):
        self._t0 = time.perf_counter()
        self._stats: Dict[str, List[float]] = {}
        self._logger = logger

    def restart(self):
        self._t0 = time.perf_counter()

    def elapsed(self, tag: str = "", sync: Optional[object] = None) -> float:
        """Seconds since start/restart; optionally block on `sync` first
        (a jax array / pytree) so device time is included (UTimer::elapsed
        semantics, Timer.cpp:213-218)."""
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - self._t0
        if tag:
            self._stats.setdefault(tag, []).append(dt)
            if self._logger:
                self._logger.warning("%s: %.3f ms", tag, dt * 1e3)
        self._t0 = time.perf_counter()
        return dt

    @contextlib.contextmanager
    def stage(self, tag: str, sync_out=None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            out = holder.get("sync", sync_out)
            if out is not None:
                jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            self._stats.setdefault(tag, []).append(dt)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for tag, xs in self._stats.items():
            out[tag] = {
                "count": len(xs),
                "mean_ms": 1e3 * sum(xs) / len(xs),
                "max_ms": 1e3 * max(xs),
                "total_s": sum(xs),
            }
        return out


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context for TPU timeline captures."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def memory_usage_mb() -> float:
    """Process RSS in MiB (UProcessInfo::getMemoryUsage equivalent,
    utilite/src/ProcessInfo.cpp:11-30)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
