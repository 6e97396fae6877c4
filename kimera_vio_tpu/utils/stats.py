"""Runtime statistics collection — the reference's utils::Statistics
(src/utils/Statistics.cpp, utils/Statistics.h:58-206): tag -> windowed
accumulator of samples, printable as the same style of table the reference
dumps from Pipeline::printStatistics (README.md:211-250)."""

from __future__ import annotations

import math
from collections import defaultdict


class _Accumulator:
    """Windowed accumulator (last `window` samples + lifetime totals)."""

    def __init__(self, window: int = 100):
        self.window = window
        self.samples: list[float] = []
        self.total = 0.0
        self.count = 0
        self.vmin = math.inf
        self.vmax = -math.inf

    def add(self, v: float):
        self.samples.append(v)
        if len(self.samples) > self.window:
            self.samples.pop(0)
        self.total += v
        self.count += 1
        self.vmin = min(self.vmin, v)
        self.vmax = max(self.vmax, v)

    @property
    def mean(self):
        return self.total / self.count if self.count else 0.0

    @property
    def windowed_mean(self):
        return sum(self.samples) / len(self.samples) if self.samples else 0.0

    @property
    def std(self):
        if len(self.samples) < 2:
            return 0.0
        m = self.windowed_mean
        return math.sqrt(
            sum((s - m) ** 2 for s in self.samples) / (len(self.samples) - 1)
        )


class StatsCollector:
    """Global-style stats registry; one per pipeline."""

    def __init__(self):
        self._acc: dict[str, _Accumulator] = defaultdict(_Accumulator)

    def add(self, tag: str, value: float):
        self._acc[tag].add(value)

    def get(self, tag: str) -> _Accumulator:
        return self._acc[tag]

    def print_table(self) -> str:
        lines = ["Statistics", "-" * 72]
        for tag in sorted(self._acc):
            a = self._acc[tag]
            lines.append(
                f"{tag:<28} #{a.count:>6}  "
                f"{a.windowed_mean:9.3f} +- {a.std:7.3f}  "
                f"[{a.vmin:9.3f},{a.vmax:9.3f}]"
            )
        return "\n".join(lines)
