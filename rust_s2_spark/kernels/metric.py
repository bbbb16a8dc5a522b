"""S2 level metrics (public constants; ref /root/reference/src/s2/metric.rs:56-110).

Used to pick covering levels, kNN ring radii, and partition bucket levels.
``min_level``/``max_level`` must use ilogb (exponent-extraction) semantics,
not log2, to reproduce the exact level boundaries the reference tests
assert (metric.rs:178-210).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

MAX_LEVEL = 30
_SQRT2 = math.sqrt(2.0)


def _ilogb(x: float) -> int:
    """C ilogb: exponent e with 2^e <= |x| < 2^(e+1)."""
    m, e = math.frexp(x)  # x = m * 2^e with 0.5 <= |m| < 1
    return e - 1


@dataclass(frozen=True)
class Metric:
    dim: int
    deriv: float

    def value(self, level: int) -> float:
        return math.ldexp(self.deriv, -self.dim * level)

    def min_level(self, val: float) -> int:
        # Deliberate divergence from the reference: metric.rs:131 computes
        # (-ilogb(x)) >> (dim-1), a precedence slip vs the C++ original's
        # -(ilogb(x) >> (dim-1)); for dim=2 metrics with odd negative
        # exponents the two differ by one level. We keep the C++ semantics
        # (pinned by tests/test_kernels_golden.py metric goldens).
        if val <= 0:
            return MAX_LEVEL
        level = -(_ilogb(val / self.deriv) >> (self.dim - 1))
        return max(0, min(MAX_LEVEL, level))

    def max_level(self, val: float) -> int:
        if val <= 0:
            return MAX_LEVEL
        level = _ilogb(self.deriv / val) >> (self.dim - 1)
        return max(0, min(MAX_LEVEL, level))

    def closest_level(self, val: float) -> int:
        x = 2.0 if self.dim == 2 else _SQRT2
        return self.min_level(x * val)


MIN_ANGLE_SPAN = Metric(1, 4.0 / 3.0)
AVG_ANGLE_SPAN = Metric(1, math.pi / 2.0)
MAX_ANGLE_SPAN = Metric(1, 1.7048971791992185)

MIN_WIDTH = Metric(1, 2.0 * _SQRT2 / 3.0)
AVG_WIDTH = Metric(1, 1.4345236728860995)
MAX_WIDTH = Metric(1, MAX_ANGLE_SPAN.deriv)

MIN_EDGE = Metric(1, 2.0 * _SQRT2 / 3.0)
AVG_EDGE = Metric(1, 1.4592137463861061)
MAX_EDGE = Metric(1, MAX_ANGLE_SPAN.deriv)

MAX_EDGE_ASPECT = 1.442615274452683

MIN_AREA = Metric(2, 8.0 * _SQRT2 / 9.0)
AVG_AREA = Metric(2, 4.0 * math.pi / 6.0)
MAX_AREA = Metric(2, 2.6357992569631614)

MIN_DIAG = Metric(1, 8.0 * _SQRT2 / 9.0)
AVG_DIAG = Metric(1, 2.0604227389984717)
MAX_DIAG = Metric(1, 2.438654594434021)

MAX_DIAG_ASPECT = math.sqrt(3.0)
