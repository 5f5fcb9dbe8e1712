"""R1Interval / S1Interval ports (r1interval.h, s1interval.h/.cc).

S1Interval: closed interval on the unit circle, endpoints in (-π, π];
inverted (lo > hi) wraps through π.  Empty = [π, -π], Full = [-π, π].
Semantics copied from the reference (s1interval.cc).
"""

from __future__ import annotations

import math

PI = math.pi


class R1Interval:
    __slots__ = ("lo", "hi")

    def __init__(self, lo: float, hi: float):
        self.lo = lo
        self.hi = hi

    @staticmethod
    def empty() -> "R1Interval":
        return R1Interval(1.0, 0.0)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "R1Interval":
        return R1Interval(min(p1, p2), max(p1, p2))

    def is_empty(self) -> bool:
        return self.lo > self.hi

    def __eq__(self, y) -> bool:
        """operator== (r1interval.h:169-173): bounds equal, or both empty."""
        if not isinstance(y, R1Interval):
            return NotImplemented
        return (self.lo == y.lo and self.hi == y.hi) or (
            self.is_empty() and y.is_empty()
        )

    def __hash__(self):
        if self.is_empty():
            return hash(("R1Interval", "empty"))
        return hash(("R1Interval", self.lo, self.hi))

    def get_center(self) -> float:
        return 0.5 * (self.lo + self.hi)

    def get_length(self) -> float:
        return self.hi - self.lo

    def contains(self, p: float) -> bool:
        return self.lo <= p <= self.hi

    def interior_contains(self, p: float) -> bool:
        return self.lo < p < self.hi

    def contains_interval(self, y: "R1Interval") -> bool:
        if y.is_empty():
            return True
        return y.lo >= self.lo and y.hi <= self.hi

    def intersects(self, y: "R1Interval") -> bool:
        if self.lo <= y.lo:
            return y.lo <= self.hi and y.lo <= y.hi
        return self.lo <= y.hi and self.lo <= self.hi

    def expanded(self, margin: float) -> "R1Interval":
        if self.is_empty():
            return R1Interval(self.lo, self.hi)
        return R1Interval(self.lo - margin, self.hi + margin)

    def intersection(self, y: "R1Interval") -> "R1Interval":
        return R1Interval(max(self.lo, y.lo), min(self.hi, y.hi))

    def union(self, y: "R1Interval") -> "R1Interval":
        if self.is_empty():
            return R1Interval(y.lo, y.hi)
        if y.is_empty():
            return R1Interval(self.lo, self.hi)
        return R1Interval(min(self.lo, y.lo), max(self.hi, y.hi))

    def interior_contains_interval(self, y: "R1Interval") -> bool:
        """R1Interval::InteriorContains(R1Interval) (r1interval.h)."""
        if y.is_empty():
            return True
        return y.lo > self.lo and y.hi < self.hi

    def interior_intersects(self, y: "R1Interval") -> bool:
        """R1Interval::InteriorIntersects (r1interval.h)."""
        return (
            y.lo < self.hi
            and self.lo < y.hi
            and self.lo < self.hi
            and y.lo <= y.hi
        )

    def project(self, p: float) -> float:
        """R1Interval::Project (r1interval.h): clamp to the interval."""
        assert not self.is_empty()
        return max(self.lo, min(self.hi, p))

    def add_point(self, p: float) -> None:
        if self.is_empty():
            self.lo = self.hi = p
        else:
            self.lo = min(self.lo, p)
            self.hi = max(self.hi, p)

    def add_interval(self, y: "R1Interval") -> None:
        """R1Interval::AddInterval (r1interval.h)."""
        if y.is_empty():
            return
        if self.is_empty():
            self.lo, self.hi = y.lo, y.hi
        else:
            self.lo = min(self.lo, y.lo)
            self.hi = max(self.hi, y.hi)


def _positive_distance(a: float, b: float) -> float:
    """s1interval.cc PositiveDistance: distance a→b in [0, 2π)."""
    d = b - a
    if d >= 0:
        return d
    return (b + PI) - (a - PI)


class S1Interval:
    __slots__ = ("lo", "hi")

    def __init__(self, lo: float, hi: float, checked: bool = False):
        if not checked:
            # both conditions test the ORIGINAL arguments (s1interval.h
            # constructor): S1Interval(-Pi, -Pi) normalizes to [Pi, Pi],
            # not to the empty interval
            orig_lo, orig_hi = lo, hi
            if orig_lo == -PI and orig_hi != PI:
                lo = PI
            if orig_hi == -PI and orig_lo != PI:
                hi = PI
        self.lo = lo
        self.hi = hi

    def __eq__(self, y) -> bool:
        """operator== (s1interval.h:258-260): exact endpoint equality
        (normalization makes this set equality)."""
        if not isinstance(y, S1Interval):
            return NotImplemented
        return self.lo == y.lo and self.hi == y.hi

    def __hash__(self):
        return hash(("S1Interval", self.lo, self.hi))

    @staticmethod
    def is_valid_point(p: float) -> bool:
        """S1Interval::IsValidPoint (s1interval.h): p in [-Pi, Pi]."""
        return -PI <= p <= PI

    @staticmethod
    def empty() -> "S1Interval":
        return S1Interval(PI, -PI, checked=True)

    @staticmethod
    def full() -> "S1Interval":
        return S1Interval(-PI, PI, checked=True)

    @staticmethod
    def from_point(p: float) -> "S1Interval":
        if p == -PI:
            p = PI
        return S1Interval(p, p, checked=True)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "S1Interval":
        if p1 == -PI:
            p1 = PI
        if p2 == -PI:
            p2 = PI
        if _positive_distance(p1, p2) <= PI:
            return S1Interval(p1, p2, checked=True)
        return S1Interval(p2, p1, checked=True)

    def is_valid(self) -> bool:
        # s1interval.h: |lo|,|hi| <= Pi, and -Pi is only allowed paired
        return (
            abs(self.lo) <= PI
            and abs(self.hi) <= PI
            and not (self.lo == -PI and self.hi != PI)
            and not (self.hi == -PI and self.lo != PI)
        )

    def is_full(self) -> bool:
        return self.lo == -PI and self.hi == PI

    def is_empty(self) -> bool:
        return self.lo == PI and self.hi == -PI

    def is_inverted(self) -> bool:
        return self.lo > self.hi

    def get_center(self) -> float:
        center = 0.5 * (self.lo + self.hi)
        if not self.is_inverted():
            return center
        return center + PI if center <= 0 else center - PI

    def get_length(self) -> float:
        length = self.hi - self.lo
        if length >= 0:
            return length
        length += 2 * PI
        return length if length > 0 else -1.0

    def _fast_contains(self, p: float) -> bool:
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def contains(self, p: float) -> bool:
        if p == -PI:
            p = PI
        return self._fast_contains(p)

    def interior_contains(self, p: float) -> bool:
        if p == -PI:
            p = PI
        if self.is_inverted():
            return p > self.lo or p < self.hi
        return (self.lo < p < self.hi) or self.is_full()

    def contains_interval(self, y: "S1Interval") -> bool:
        if self.is_inverted():
            if y.is_inverted():
                return y.lo >= self.lo and y.hi <= self.hi
            return (y.lo >= self.lo or y.hi <= self.hi) and not self.is_empty()
        if y.is_inverted():
            return self.is_full() or y.is_empty()
        return y.lo >= self.lo and y.hi <= self.hi

    def intersects(self, y: "S1Interval") -> bool:
        if self.is_empty() or y.is_empty():
            return False
        if self.is_inverted():
            return y.is_inverted() or y.lo <= self.hi or y.hi >= self.lo
        if y.is_inverted():
            return y.lo <= self.hi or y.hi >= self.lo
        return y.lo <= self.hi and y.hi >= self.lo

    def expanded(self, margin: float) -> "S1Interval":
        if margin >= 0:
            if self.is_empty():
                return S1Interval(self.lo, self.hi, checked=True)
            if self.get_length() + 2 * margin + 2 * 2.220446049250313e-16 >= 2 * PI:
                return S1Interval.full()
        else:
            if self.is_full():
                return S1Interval(self.lo, self.hi, checked=True)
            if self.get_length() + 2 * margin - 2 * 2.220446049250313e-16 <= 0:
                return S1Interval.empty()
        lo = math.remainder(self.lo - margin, 2 * PI)
        hi = math.remainder(self.hi + margin, 2 * PI)
        if lo <= -PI:
            lo = PI
        # the reference returns through the normalizing constructor
        # (s1interval.cc Expanded), so a -Pi endpoint flips to +Pi
        return S1Interval(lo, hi)

    def intersection(self, y: "S1Interval") -> "S1Interval":
        """S1Interval::Intersection (s1interval.cc:257-281)."""
        if y.is_empty():
            return S1Interval.empty()
        if self._fast_contains(y.lo):
            if self._fast_contains(y.hi):
                # either self ⊇ y, or the intersection is two disjoint
                # subintervals — return the shorter original interval
                if y.get_length() < self.get_length():
                    return y
                return self
            return S1Interval(y.lo, self.hi, checked=True)
        if self._fast_contains(y.hi):
            return S1Interval(self.lo, y.hi, checked=True)
        if y._fast_contains(self.lo):
            return self
        return S1Interval.empty()

    def interior_contains_interval(self, y: "S1Interval") -> bool:
        """S1Interval::InteriorContains(S1Interval) (s1interval.cc)."""
        if self.is_inverted():
            if not y.is_inverted():
                return y.lo > self.lo or y.hi < self.hi
            return (y.lo > self.lo and y.hi < self.hi) or y.is_empty()
        if y.is_inverted():
            return self.is_full() or y.is_empty()
        return (y.lo > self.lo and y.hi < self.hi) or self.is_full()

    def interior_intersects(self, y: "S1Interval") -> bool:
        """S1Interval::InteriorIntersects (s1interval.cc)."""
        if self.is_empty() or y.is_empty() or self.lo == self.hi:
            return False
        if self.is_inverted():
            return y.is_inverted() or y.lo < self.hi or y.hi > self.lo
        if y.is_inverted():
            return y.lo < self.hi or y.hi > self.lo
        return (y.lo < self.hi and y.hi > self.lo) or self.is_full()

    def complement(self) -> "S1Interval":
        """S1Interval::Complement (s1interval.cc): singleton → full;
        otherwise swap endpoints (handles empty and full)."""
        if self.lo == self.hi:
            return S1Interval.full()
        return S1Interval(self.hi, self.lo, checked=True)

    def get_complement_center(self) -> float:
        """S1Interval::GetComplementCenter (s1interval.cc:135-139)."""
        if self.lo != self.hi:
            return self.complement().get_center()
        return self.hi + PI if self.hi <= 0 else self.hi - PI

    def directed_hausdorff(self, y: "S1Interval") -> float:
        """S1Interval::GetDirectedHausdorffDistance
        (s1interval.cc:145-162)."""
        if y.contains_interval(self):
            return 0.0
        if y.is_empty():
            return PI
        yc = y.get_complement_center()
        if self.contains(yc):
            return _positive_distance(y.hi, yc)
        hi_hi = (
            _positive_distance(y.hi, self.hi)
            if S1Interval(y.hi, yc, checked=True).contains(self.hi)
            else 0.0
        )
        lo_lo = (
            _positive_distance(self.lo, y.lo)
            if S1Interval(yc, y.lo, checked=True).contains(self.lo)
            else 0.0
        )
        return max(hi_hi, lo_lo)

    def union(self, y: "S1Interval") -> "S1Interval":
        if y.is_empty():
            return S1Interval(self.lo, self.hi, checked=True)
        if self._fast_contains(y.lo):
            if self._fast_contains(y.hi):
                if self.contains_interval(y):
                    return S1Interval(self.lo, self.hi, checked=True)
                return S1Interval.full()
            return S1Interval(self.lo, y.hi, checked=True)
        if self._fast_contains(y.hi):
            return S1Interval(y.lo, self.hi, checked=True)
        if self.is_empty() or y._fast_contains(self.lo):
            return S1Interval(y.lo, y.hi, checked=True)
        dlo = _positive_distance(y.hi, self.lo)
        dhi = _positive_distance(self.hi, y.lo)
        if dlo < dhi:
            return S1Interval(y.lo, self.hi, checked=True)
        return S1Interval(self.lo, y.hi, checked=True)

    def add_point(self, p: float) -> None:
        if p == -PI:
            p = PI
        if self._fast_contains(p):
            return
        if self.is_empty():
            self.lo = self.hi = p
        else:
            dlo = _positive_distance(p, self.lo)
            dhi = _positive_distance(self.hi, p)
            if dlo < dhi:
                self.lo = p
            else:
                self.hi = p
