"""Profiling/tracing utilities.

The reference's only observability is wall-clock step averaging
(trainer/*.py speed printouts). Here profiling is first-class:
`trace()` wraps a code region in a jax.profiler trace (viewable in
TensorBoard / Perfetto), `StepTimer` tracks per-step wall time with
percentiles, and `device_memory_stats` snapshots live HBM usage.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a region: .trace('logs/profile')."""
    import jax
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step statistics (mean / p50 / p95 / steps-per-sec)."""

    def __init__(self, window: int = 500) -> None:
        self.window = window
        self.times: List[float] = []
        self._start: Optional[float] = None

    def __enter__(self) -> 'StepTimer':
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.times.append(time.perf_counter() - self._start)
        if len(self.times) > self.window:
            self.times = self.times[-self.window:]

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {}
        import numpy as np
        t = np.asarray(self.times)
        return {'mean_s': float(t.mean()),
                'p50_s': float(np.percentile(t, 50)),
                'p95_s': float(np.percentile(t, 95)),
                'steps_per_sec': float(1.0 / max(t.mean(), 1e-9))}


class StepTraceController:
    """Env-controlled training-loop tracing, wired into every trainer:

    FTT_PROFILE_DIR=<dir>    enable; trace is written there
    FTT_PROFILE_START=<n>    first step to capture (default 20 —
                             past compilation and warmup retraces)
    FTT_PROFILE_STEPS=<n>    how many steps to capture (default 10)

    Call `tick(step)` once per training step; the controller starts
    the jax.profiler trace at START and stops it STEPS later. Safe
    no-op when FTT_PROFILE_DIR is unset."""

    def __init__(self) -> None:
        import os
        self.dir = os.environ.get('FTT_PROFILE_DIR')
        self.start = int(os.environ.get('FTT_PROFILE_START', 20))
        self.steps = int(os.environ.get('FTT_PROFILE_STEPS', 10))
        self._active = False
        self._done = False

    def tick(self, step: int) -> None:
        if self.dir is None or self._done:
            return
        import jax
        if not self._active and step >= self.start:
            jax.profiler.start_trace(self.dir)
            self._active = True
            self._stop_at = step + self.steps
        elif self._active and step >= self._stop_at:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            print(f'\n[profiler] trace for steps '
                  f'{self.start}..{self._stop_at} written to {self.dir}')

    def close(self) -> None:
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
            self._done = True


def device_memory_stats() -> Dict[str, int]:
    import jax
    dev = jax.devices()[0]
    stats = getattr(dev, 'memory_stats', lambda: None)()
    if not stats:
        return {}
    return {'bytes_in_use': stats.get('bytes_in_use', 0),
            'peak_bytes_in_use': stats.get('peak_bytes_in_use', 0),
            'bytes_limit': stats.get('bytes_limit', 0)}
