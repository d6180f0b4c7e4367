"""Windowed metric meters + device memory telemetry.

Capability parity with ``yolox.utils.MeterBuffer`` / ``gpu_mem_usage``
consumed by the reference trainer (`/root/reference/exps/train_utils/
double_trainer.py:61,125-131,238-266`): running-window averages keyed by
name, filterable by substring, plus a TPU HBM usage readout.
"""

from __future__ import annotations

import time
from collections import defaultdict, deque
from typing import Dict, Optional


class AverageMeter:
    """Track a series of values; report median/avg over a fixed window and a
    global average."""

    def __init__(self, window_size: int = 50):
        self._deque = deque(maxlen=window_size)
        self._total = 0.0
        self._count = 0

    def update(self, value):
        value = float(value)
        self._deque.append(value)
        self._count += 1
        self._total += value

    @property
    def median(self) -> float:
        if not self._deque:
            return 0.0
        d = sorted(self._deque)
        return d[len(d) // 2]

    @property
    def avg(self) -> float:
        return sum(self._deque) / max(len(self._deque), 1)

    @property
    def global_avg(self) -> float:
        return self._total / max(self._count, 1)

    @property
    def latest(self) -> Optional[float]:
        return self._deque[-1] if self._deque else None

    @property
    def total(self) -> float:
        return self._total

    def reset(self):
        self._deque.clear()
        self._total = 0.0
        self._count = 0

    def clear(self):
        self._deque.clear()


class MeterBuffer(defaultdict):
    """Dict of AverageMeters with substring filtering."""

    def __init__(self, window_size: int = 20):
        factory = lambda: AverageMeter(window_size=window_size)
        super().__init__(factory)

    def reset(self):
        for v in self.values():
            v.reset()

    def get_filtered_meter(self, filter_key: str = "time") -> Dict[str, AverageMeter]:
        return {k: v for k, v in self.items() if filter_key in k}

    def update(self, values=None, **kwargs):
        if values is None:
            values = {}
        values.update(kwargs)
        for k, v in values.items():
            self[k].update(v)

    def clear_meters(self):
        for v in self.values():
            v.clear()


def device_mem_usage_mb() -> float:
    """Bytes in use on the first accelerator, in MB (the TPU analogue of
    ``gpu_mem_usage``). Returns 0 when the backend exposes no stats (CPU)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return (stats or {}).get("bytes_in_use", 0) / (1024 * 1024)
    except Exception:
        return 0.0
