"""Cooperative cancellation for generation loops.

Parity target: the reference's interrupt flag — set at
``/root/reference/inference.py:533``, checked per transformer block
(``transformer3d.py:468-487``, ``wan/modules/model.py:1074-1075``,
``text2video.py:358, 500-538``). Inside an XLA-compiled loop a host flag
cannot be polled, so cancellation here is STEP-granular: pipelines offer a
host-side step loop (one jitted denoise step per iteration) that consults
the flag between steps — SURVEY §5's prescribed design. The fully-scanned
loop remains the fast path when cancellation isn't needed.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional


class InterruptFlag:
    """Thread-safe cancellation flag (the ``model._interrupt`` analogue)."""

    def __init__(self):
        self._event = threading.Event()

    def interrupt(self) -> None:
        self._event.set()

    def clear(self) -> None:
        self._event.clear()

    @property
    def interrupted(self) -> bool:
        return self._event.is_set()

    def __call__(self) -> bool:
        return self.interrupted


class Interrupted(Exception):
    """Raised by step loops when the flag fires mid-generation."""


def check(flag: Optional[Callable[[], bool]]) -> None:
    if flag is not None and flag():
        raise Interrupted()
