"""Profiling and metrics hooks — aux systems the reference lacks
(SURVEY §5: its only observability is wall-clock request logging and tqdm).

- ``trace(path)``: JAX profiler trace context (view in xprof/TensorBoard);
- ``StageTimer``: per-stage wall timers with a one-line report (the
  text-encode / denoise / vae-decode split of a request);
- ``Metrics``: process-wide counters/gauges with a JSON snapshot — wired
  into the server for a ``/metrics``-style surface.
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from collections import defaultdict
from typing import Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a JAX profiler trace for everything inside the context."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage timing; blocks on device results per stage so the
    numbers mean what they say."""

    def __init__(self):
        self.stages: dict[str, float] = {}
        self._order: list[str] = []

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self.stages:
                self._order.append(name)
            self.stages[name] = self.stages.get(name, 0.0) + dt

    def report(self) -> str:
        total = sum(self.stages.values())
        parts = [
            f"{name}={self.stages[name]:.3f}s" for name in self._order
        ]
        return f"total={total:.3f}s " + " ".join(parts)


class Metrics:
    """Process-wide counters and gauges (thread-safe)."""

    _lock = threading.Lock()
    _counters: dict[str, float] = defaultdict(float)
    _gauges: dict[str, float] = {}

    @classmethod
    def inc(cls, name: str, value: float = 1.0) -> None:
        with cls._lock:
            cls._counters[name] += value

    @classmethod
    def set(cls, name: str, value: float) -> None:
        with cls._lock:
            cls._gauges[name] = value

    @classmethod
    def snapshot(cls) -> dict:
        with cls._lock:
            return {
                "counters": dict(cls._counters),
                "gauges": dict(cls._gauges),
            }

    @classmethod
    def to_json(cls) -> str:
        return json.dumps(cls.snapshot())

    @classmethod
    def reset(cls) -> None:
        with cls._lock:
            cls._counters.clear()
            cls._gauges.clear()
