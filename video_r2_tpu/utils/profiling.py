"""Tracing / profiling: per-phase wall timing + JAX profiler traces.

Upgrades the reference's TRL @profiling_decorator hooks (grpo_trainer.py:46,
711,722,850) to first-class phase metrics (SURVEY §5): every GRPO cycle and
train loop can report decode/reward/forward/backward timings, and a real XLA
trace can be captured with `profile_trace` for tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulates wall time per named phase; `metrics()` emits
    profiling/<phase>_s means since the last flush."""

    def __init__(self):
        self._acc: dict[str, float] = defaultdict(float)
        self._count: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name] += time.perf_counter() - t0
            self._count[name] += 1

    def metrics(self, flush: bool = True) -> dict[str, float]:
        out = {f"profiling/{k}_s": v / max(self._count[k], 1)
               for k, v in self._acc.items()}
        if flush:
            self._acc.clear()
            self._count.clear()
        return out


@contextlib.contextmanager
def profiling_phase(timer: "PhaseTimer | None", name: str):
    """No-op when timer is None (zero-cost opt-in)."""
    if timer is None:
        yield
    else:
        with timer.phase(name):
            yield


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Capture a jax profiler trace (view in tensorboard / xprof)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
