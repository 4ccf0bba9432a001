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


# ---------------------------------------------------------------------------
# Ambient stage collection
#
# Pipelines mark their phases with ``stage("denoise")``; the marks are
# no-ops unless a caller wraps the request in ``collect_stages(timer)``
# (the serving stage-breakdown tool does). Nested stages record
# slash-joined names ("pass1/denoise").
# ---------------------------------------------------------------------------

_collect_lock = threading.Lock()
_active_timer: "StageTimer | None" = None
_collector_thread: int | None = None
_prefix: list[str] = []


@contextlib.contextmanager
def collect_stages(timer: "StageTimer") -> Iterator[None]:
    global _active_timer, _collector_thread
    with _collect_lock:  # one collector at a time (tooling, not serving)
        _active_timer = timer
        _collector_thread = threading.get_ident()
        _prefix.clear()
        try:
            yield
        finally:
            _active_timer = None
            _collector_thread = None


@contextlib.contextmanager
def stage(name: str, sync=None) -> Iterator[None]:
    """Time a pipeline phase when a collector is active (no-op otherwise).

    Marks from threads OTHER than the one that entered ``collect_stages``
    are no-ops: the server's background warmup thread also calls
    ``generate()``, and its marks interleaving pops/pushes into the
    collecting request's ``_prefix`` stack would corrupt stage names.

    ``sync``: optional zero-arg callable returning a device array; called
    on exit and synced with a one-element host fetch so the stage's async
    dispatches are actually attributed to it (``block_until_ready`` is
    unreliable through the relay).
    """
    if _active_timer is None or threading.get_ident() != _collector_thread:
        yield
        return
    _prefix.append(name)
    full = "/".join(_prefix)
    t0 = time.perf_counter()
    body_ok = False
    try:
        yield
        body_ok = True
    finally:
        try:
            # sync only when the body completed: the callable typically
            # closes over variables assigned INSIDE the block, and running
            # it after an exception would raise NameError over the real
            # error
            if body_ok and sync is not None:
                import numpy as np

                arr = sync()
                if arr is not None:
                    # one-element host fetch = device sync. Index ON DEVICE
                    # first — np.asarray(arr) would fetch the whole array
                    # (~90 s for full-res pixels through a 13 MB/s relay)
                    # and bill the transfer to the stage being measured; a
                    # device reshape(-1) is no better (XLA materializes a
                    # padded tiled-layout copy — 40x the bytes for a
                    # channels-last pixel array).
                    np.asarray(arr[(0,) * getattr(arr, "ndim", 0)])
        finally:
            # the pop + record must survive a failing sync, or the global
            # prefix stack stays corrupted for every later stage
            dt = time.perf_counter() - t0
            _prefix.pop()
            tm = _active_timer
            if tm is not None:
                # rows are inclusive; nested names ("pass1/denoise") let
                # the reader/tooling attribute parent time to children
                if full not in tm.stages:
                    tm._order.append(full)
                tm.stages[full] = tm.stages.get(full, 0.0) + dt


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
