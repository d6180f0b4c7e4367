"""Clock abstraction for the streaming harness.

The reference's online loop reads ``perf_counter`` directly
(`/root/reference/sAP/streamyolo/streamyolo_det.py:152-195`), which makes the
protocol untestable without the target GPU; its own workaround is a separate
simulated-runtime script (`sAP/det/srt_det.py:72-165`). Here the clock is a
parameter: ``WallClock`` reproduces the real-time behavior, ``SimClock``
advances only when told (by simulated runtimes drawn from an ``Empirical``
distribution), so ONE streaming loop serves both the real TPU run and the
CPU-CI simulation (SURVEY.md §4.3).
"""

from __future__ import annotations

import time


class WallClock:
    """Real wall-clock time; ``advance`` is a no-op (time passes by itself)."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def reset(self):
        self._t0 = time.perf_counter()

    def now(self) -> float:
        return time.perf_counter() - self._t0

    def advance(self, dt: float) -> None:  # real work already took dt
        pass


class SimClock:
    """Virtual time: only ``advance`` moves the clock. Deterministic."""

    def __init__(self):
        self._t = 0.0

    def reset(self):
        self._t = 0.0

    def now(self) -> float:
        return self._t

    def advance(self, dt: float) -> None:
        assert dt >= 0
        self._t += dt
