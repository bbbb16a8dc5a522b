"""R1 (latitude) and S1 (longitude, wraparound) intervals.

Semantics follow the public S2 interval types as exercised by the
reference tests (/root/reference/src/r1/interval.rs,
/root/reference/src/s1/interval.rs). An S1Interval with lo > hi is
"inverted" and crosses the ±180° date line; [π, -π] is empty and
[-π, π] is full.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

PI = math.pi
EPSILON = 1e-14  # ref consts.rs:8 — noise level for approx_eq


@dataclass(frozen=True)
class R1Interval:
    lo: float
    hi: float

    @staticmethod
    def empty() -> "R1Interval":
        return R1Interval(1.0, 0.0)

    @staticmethod
    def from_point(p: float) -> "R1Interval":
        return R1Interval(p, p)

    def is_empty(self) -> bool:
        return self.lo > self.hi

    def center(self) -> float:
        return 0.5 * (self.lo + self.hi)

    def length(self) -> float:
        return self.hi - self.lo

    def contains(self, p: float) -> bool:
        return self.lo <= p <= self.hi

    def interior_contains(self, p: float) -> bool:
        return self.lo < p < self.hi

    def contains_interval(self, o: "R1Interval") -> bool:
        if o.is_empty():
            return True
        return o.lo >= self.lo and o.hi <= self.hi

    def interior_contains_interval(self, o: "R1Interval") -> bool:
        if o.is_empty():
            return True
        return o.lo > self.lo and o.hi < self.hi

    def approx_eq(self, o: "R1Interval") -> bool:
        return self.approx_eq_by(o, EPSILON)

    def approx_eq_by(self, o: "R1Interval", max_error: float) -> bool:
        """Equal up to moving each endpoint by max_error; the empty
        interval matches anything short enough (ref r1/interval.rs:169-186)."""
        if self.is_empty():
            return o.length() < 2.0 * max_error
        if o.is_empty():
            return self.length() < 2.0 * max_error
        return (
            abs(self.lo - o.lo) <= max_error and abs(self.hi - o.hi) <= max_error
        )

    def intersects(self, o: "R1Interval") -> bool:
        if self.lo <= o.lo:
            return o.lo <= self.hi and o.lo <= o.hi
        return self.lo <= o.hi and self.lo <= self.hi

    def interior_intersects(self, o: "R1Interval") -> bool:
        return o.lo < self.hi and self.lo < o.hi and self.lo < self.hi and o.lo <= o.hi

    def add_point(self, p: float) -> "R1Interval":
        if self.is_empty():
            return R1Interval(p, p)
        return R1Interval(min(self.lo, p), max(self.hi, p))

    def union(self, o: "R1Interval") -> "R1Interval":
        if self.is_empty():
            return o
        if o.is_empty():
            return self
        return R1Interval(min(self.lo, o.lo), max(self.hi, o.hi))

    def intersection(self, o: "R1Interval") -> "R1Interval":
        return R1Interval(max(self.lo, o.lo), min(self.hi, o.hi))

    def expanded(self, margin: float) -> "R1Interval":
        if self.is_empty():
            return self
        return R1Interval(self.lo - margin, self.hi + margin)

    def directed_hausdorff_distance(self, o: "R1Interval") -> float:
        """max_{p∈self} min_{q∈o} |p−q| (ref r1/interval.rs:191-199)."""
        if self.is_empty():
            return 0.0
        if o.is_empty():
            return math.inf
        return max(0.0, max(self.hi - o.hi, o.lo - self.lo))


@dataclass(frozen=True)
class S1Interval:
    """Longitude interval in [-π, π] with date-line wraparound.

    Invariants (ref s1/interval.rs:25-60): endpoints in [-π, π]; -π is
    normalized to π except for the full interval [-π, π]; inverted
    (lo > hi) means the interval wraps through ±π.
    """

    lo: float
    hi: float

    @staticmethod
    def new(lo: float, hi: float) -> "S1Interval":
        # both checks test the ORIGINAL endpoints (so [-π,-π] → [π,π])
        new_lo = PI if (lo == -PI and hi != PI) else lo
        new_hi = PI if (hi == -PI and lo != PI) else hi
        return S1Interval(new_lo, new_hi)

    @staticmethod
    def empty() -> "S1Interval":
        return S1Interval(PI, -PI)

    @staticmethod
    def full() -> "S1Interval":
        return S1Interval(-PI, PI)

    @staticmethod
    def from_point_pair(a: float, b: float) -> "S1Interval":
        if a == -PI:
            a = PI
        if b == -PI:
            b = PI
        if S1Interval._positive_distance(a, b) <= PI:
            return S1Interval(a, b)
        return S1Interval(b, a)

    @staticmethod
    def _positive_distance(a: float, b: float) -> float:
        d = b - a
        if d >= 0:
            return d
        return (b + PI) - (a - PI)

    def is_full(self) -> bool:
        return self.lo == -PI and self.hi == PI

    def is_empty(self) -> bool:
        return self.lo == PI and self.hi == -PI

    def complement(self) -> "S1Interval":
        """ref s1/interval.rs:353-363 (singleton → full)."""
        if self.lo == self.hi:
            return S1Interval.full()
        return S1Interval(self.hi, self.lo)

    def complement_center(self) -> float:
        """ref s1/interval.rs:368-376."""
        if self.lo != self.hi:
            return self.complement().center()
        if self.hi <= 0:
            return self.hi + PI
        return self.hi - PI

    def directed_hausdorff_distance(self, y: "S1Interval") -> float:
        """max_{p∈self} min_{q∈y} d(p,q) along S1, radians
        (ref s1/interval.rs:382-406)."""
        if y.contains_interval(self):
            return 0.0  # includes self empty
        if y.is_empty():
            return PI
        y_cc = y.complement_center()
        if self.contains(y_cc):
            return S1Interval._positive_distance(y.hi, y_cc)
        hi_hi = 0.0
        if S1Interval.new(y.hi, y_cc).contains(self.hi):
            hi_hi = S1Interval._positive_distance(y.hi, self.hi)
        lo_lo = 0.0
        if S1Interval.new(y_cc, y.lo).contains(self.lo):
            lo_lo = S1Interval._positive_distance(self.lo, y.lo)
        return max(hi_hi, lo_lo)

    def is_inverted(self) -> bool:
        return self.lo > self.hi

    def center(self) -> float:
        c = 0.5 * (self.lo + self.hi)
        if not self.is_inverted():
            return c
        if c <= 0:
            return c + PI
        return c - PI

    def length(self) -> float:
        length = self.hi - self.lo
        if length >= 0:
            return length
        length += 2 * PI
        if length > 0:
            return length
        return -1.0

    def fast_contains(self, p: float) -> bool:
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def contains(self, p: float) -> bool:
        if p == -PI:
            p = PI
        return self.fast_contains(p)

    def interior_contains(self, p: float) -> bool:
        if p == -PI:
            p = PI
        if self.is_inverted():
            return p > self.lo or p < self.hi
        return (self.lo < p < self.hi) or self.is_full()

    def contains_interval(self, o: "S1Interval") -> bool:
        if self.is_inverted():
            if o.is_inverted():
                return o.lo >= self.lo and o.hi <= self.hi
            return (o.lo >= self.lo or o.hi <= self.hi) and not self.is_empty()
        if o.is_inverted():
            return self.is_full() or o.is_empty()
        return o.lo >= self.lo and o.hi <= self.hi

    def interior_contains_interval(self, o: "S1Interval") -> bool:
        if self.is_inverted():
            if o.is_inverted():
                return (o.lo > self.lo and o.hi < self.hi) or o.is_empty()
            return o.lo > self.lo or o.hi < self.hi
        if o.is_inverted():
            return self.is_full() or o.is_empty()
        return (o.lo > self.lo and o.hi < self.hi) or self.is_full()

    def approx_eq(self, o: "S1Interval") -> bool:
        return self.approx_eq_by(o, EPSILON)

    def approx_eq_by(self, o: "S1Interval", max_error: float) -> bool:
        """ref s1/interval.rs:408-432 — truncated remainder (fmod), and a
        length check so moving endpoints cannot invert the interval."""
        if self.is_empty():
            return o.length() < 2.0 * max_error
        if o.is_empty():
            return self.length() < 2.0 * max_error
        if self.is_full():
            return o.length() >= 2.0 * (PI - max_error)
        if o.is_full():
            return self.length() >= 2.0 * (PI - max_error)
        return (
            abs(math.fmod(o.lo - self.lo, 2.0 * PI)) <= max_error
            and abs(math.fmod(o.hi - self.hi, 2.0 * PI)) <= max_error
            and abs(self.length() - o.length()) <= 2.0 * max_error
        )

    def intersects(self, o: "S1Interval") -> bool:
        if self.is_empty() or o.is_empty():
            return False
        if self.is_inverted():
            return o.is_inverted() or o.lo <= self.hi or o.hi >= self.lo
        if o.is_inverted():
            return o.lo <= self.hi or o.hi >= self.lo
        return o.lo <= self.hi and o.hi >= self.lo

    def interior_intersects(self, o: "S1Interval") -> bool:
        if self.is_empty() or o.is_empty() or self.lo == self.hi:
            return False
        if self.is_inverted():
            return o.is_inverted() or o.lo < self.hi or o.hi > self.lo
        if o.is_inverted():
            return o.lo < self.hi or o.hi > self.lo
        return (o.lo < self.hi and o.hi > self.lo) or self.is_full()

    def intersection(self, o: "S1Interval") -> "S1Interval":
        if o.is_empty():
            return S1Interval.empty()
        if self.fast_contains(o.lo):
            if self.fast_contains(o.hi):
                if o.length() < self.length():
                    return o
                return self
            return S1Interval(o.lo, self.hi)
        if self.fast_contains(o.hi):
            return S1Interval(self.lo, o.hi)
        if o.fast_contains(self.lo):
            return self
        return S1Interval.empty()

    def add_point(self, p: float) -> "S1Interval":
        if p == -PI:
            p = PI
        if self.fast_contains(p):
            return self
        if self.is_empty():
            return S1Interval(p, p)
        if S1Interval._positive_distance(p, self.lo) < S1Interval._positive_distance(
            self.hi, p
        ):
            return S1Interval(p, self.hi)
        return S1Interval(self.lo, p)

    def union(self, o: "S1Interval") -> "S1Interval":
        if o.is_empty():
            return self
        if self.fast_contains(o.lo):
            if self.fast_contains(o.hi):
                if self.contains_interval(o):
                    return self
                return S1Interval.full()
            return S1Interval(self.lo, o.hi)
        if self.fast_contains(o.hi):
            return S1Interval(o.lo, self.hi)
        if self.is_empty() or o.fast_contains(self.lo):
            return o
        dlo = S1Interval._positive_distance(o.hi, self.lo)
        dhi = S1Interval._positive_distance(self.hi, o.lo)
        if dlo < dhi:
            return S1Interval(o.lo, self.hi)
        return S1Interval(self.lo, o.hi)

    def expanded(self, margin: float) -> "S1Interval":
        if margin >= 0:
            if self.is_empty():
                return self
            if self.length() + 2 * margin + 2 * 2.220446049250313e-16 >= 2 * PI:
                return S1Interval.full()
        else:
            if self.is_full():
                return self
            if self.length() + 2 * margin - 2 * 2.220446049250313e-16 <= 0:
                return S1Interval.empty()
        lo = math.remainder(self.lo - margin, 2 * PI)
        hi = math.remainder(self.hi + margin, 2 * PI)
        if lo <= -PI:
            lo = PI
        return S1Interval(lo, hi)
