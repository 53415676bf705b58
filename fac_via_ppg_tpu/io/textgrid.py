"""Minimal Praat TextGrid object model.

The reference depends on the external `textgrid` package (reference
src/common/utterance.py:28, align.py:18) for four classes and a handful of
methods.  That package is not in this image, so this module provides a
compatible implementation of exactly the surface the pipeline uses:
Interval/IntervalTier (add, addInterval, indexContaining, _fillInTheGaps,
intervals, minTime/maxTime/name), Point/PointTier, and TextGrid (append,
getFirst, tiers, iteration, len).
"""

from __future__ import annotations

from typing import List, Optional


class Interval:
    def __init__(self, minTime: float, maxTime: float, mark: str = ""):
        if minTime >= maxTime:
            raise ValueError(
                f"Interval requires minTime < maxTime ({minTime} >= {maxTime})"
            )
        self.minTime = minTime
        self.maxTime = maxTime
        self.mark = mark

    def __eq__(self, other):
        return (
            isinstance(other, Interval)
            and self.minTime == other.minTime
            and self.maxTime == other.maxTime
            and self.mark == other.mark
        )

    def overlaps(self, other: "Interval") -> bool:
        return (
            other.minTime < self.maxTime and self.minTime < other.maxTime
        )

    def __repr__(self):
        return f"Interval({self.minTime}, {self.maxTime}, {self.mark!r})"


class Point:
    def __init__(self, time: float, mark: str = ""):
        self.time = time
        self.mark = mark

    def __repr__(self):
        return f"Point({self.time}, {self.mark!r})"


class IntervalTier:
    def __init__(self, name: str = "", minTime: float = 0.0,
                 maxTime: Optional[float] = None):
        self.name = name
        self.minTime = minTime
        self.maxTime = maxTime
        self.intervals: List[Interval] = []
        self.strict = True

    def add(self, minTime: float, maxTime: float, mark: str = ""):
        self.addInterval(Interval(minTime, maxTime, mark))

    def addInterval(self, interval: Interval):
        for existing in self.intervals:
            if self.strict and interval.overlaps(existing):
                raise ValueError(
                    f"{interval} overlaps {existing} in tier {self.name!r}"
                )
        self.intervals.append(interval)
        self.intervals.sort(key=lambda iv: iv.minTime)
        if self.maxTime is not None and interval.maxTime > self.maxTime:
            self.maxTime = interval.maxTime

    def _fillInTheGaps(self, null: str = "") -> List[Interval]:
        """Return intervals with explicit null-marked gap intervals, as the
        Praat writer needs (used by align write, reference align.py:52)."""
        out: List[Interval] = []
        prev_end = self.minTime
        for iv in self.intervals:
            if iv.minTime > prev_end:
                out.append(Interval(prev_end, iv.minTime, null))
            out.append(iv)
            prev_end = iv.maxTime
        if self.maxTime is not None and prev_end < self.maxTime:
            out.append(Interval(prev_end, self.maxTime, null))
        return out

    def indexContaining(self, time: float) -> Optional[int]:
        for i, iv in enumerate(self.intervals):
            if iv.minTime <= time < iv.maxTime:
                return i
        return None

    def __len__(self):
        return len(self.intervals)

    def __iter__(self):
        return iter(self.intervals)

    def __getitem__(self, i):
        return self.intervals[i]

    def __repr__(self):
        return f"IntervalTier({self.name!r}, n={len(self.intervals)})"


class PointTier:
    def __init__(self, name: str = "", minTime: float = 0.0,
                 maxTime: Optional[float] = None):
        self.name = name
        self.minTime = minTime
        self.maxTime = maxTime
        self.points: List[Point] = []

    def add(self, time: float, mark: str = ""):
        self.addPoint(Point(time, mark))

    def addPoint(self, point: Point):
        self.points.append(point)
        self.points.sort(key=lambda p: p.time)
        if self.maxTime is not None and point.time > self.maxTime:
            self.maxTime = point.time

    def __len__(self):
        return len(self.points)

    def __iter__(self):
        return iter(self.points)

    def __getitem__(self, i):
        return self.points[i]


class TextGrid:
    def __init__(self, name: str = "", minTime: float = 0.0,
                 maxTime: Optional[float] = None):
        self.name = name
        self.minTime = minTime
        self.maxTime = maxTime
        self.tiers: List = []
        self.strict = True

    def append(self, tier):
        self.tiers.append(tier)
        if self.maxTime is None or (
            tier.maxTime is not None and tier.maxTime > (self.maxTime or 0)
        ):
            self.maxTime = tier.maxTime

    def getFirst(self, tier_name: str):
        for tier in self.tiers:
            if tier.name == tier_name:
                return tier
        return None

    def getList(self, tier_name: str):
        return [t for t in self.tiers if t.name == tier_name]

    def getNames(self):
        return [t.name for t in self.tiers]

    def __len__(self):
        return len(self.tiers)

    def __iter__(self):
        return iter(self.tiers)

    def __getitem__(self, i):
        return self.tiers[i]
