"""RectBounder — conservative lat/lng bound of a vertex chain.

Port of the reference's standalone bounder (ref
/root/reference/src/s2/rect_bounder.rs:60-264) with the same error
constants, plus expand_for_subregions (rect_bounder.rs:267-397) used when
a bound must contain the bounds of any contained subregion (polygon
ingest / partition pruning). Verified against reference-dumped chains in
tests/golden/refdump.jsonl.

The guarantee: if a closed edge chain L contains point P (and the loop
interior contains no pole), then get_bound().contains(LatLng(P)).
"""

from __future__ import annotations

import math

from . import point as pt
from .intervals import PI, R1Interval, S1Interval
from .rect import Rect

DBL_EPSILON = 2.220446049250313e-16
_HALF_PI = math.pi / 2


def _latlng(p: pt.Vec) -> tuple[float, float]:
    lat = math.atan2(p[2], math.hypot(p[0], p[1]))
    lng = math.atan2(p[1], p[0])
    return lat, lng


def _rect_from_latlng_pair(a: tuple[float, float], b: tuple[float, float]) -> Rect:
    """ref rect.rs Rect::from_point_pair."""
    return Rect(
        R1Interval(min(a[0], b[0]), max(a[0], b[0])),
        S1Interval.from_point_pair(a[1], b[1]),
    )


def _rect_add_latlng(r: Rect, ll: tuple[float, float]) -> Rect:
    lat = r.lat.add_point(ll[0])
    lng = r.lng.add_point(ll[1])
    return Rect(lat, lng)


class RectBounder:
    """Streaming bound accumulator: add_point() per vertex, get_bound()
    at the end (ref rect_bounder.rs:83-264)."""

    def __init__(self) -> None:
        self._a: pt.Vec | None = None
        self._a_ll: tuple[float, float] | None = None
        self._bound = Rect.empty()

    def add_point(self, b: pt.Vec) -> None:
        b_ll = _latlng(b)
        if self._a is None:
            self._bound = _rect_add_latlng(self._bound, b_ll)
        else:
            a, a_ll = self._a, self._a_ll
            # N = 2·(A×B), computed as (A−B)×(A+B) for robustness
            n = pt.cross(
                (a[0] - b[0], a[1] - b[1], a[2] - b[2]),
                (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
            )
            n_norm = math.sqrt(pt.dot(n, n))
            if n_norm < 1.91346e-15:
                # nearly identical or antipodal (within 4.309·ε)
                if pt.dot(a, b) < 0:
                    self._bound = Rect.full()
                else:
                    self._bound = self._bound.union(
                        _rect_from_latlng_pair(a_ll, b_ll)
                    )
            else:
                lng_ab = S1Interval.from_point_pair(a_ll[1], b_ll[1])
                if lng_ab.length() >= PI - 2 * DBL_EPSILON:
                    lng_ab = S1Interval.full()
                lat_ab = R1Interval(
                    min(a_ll[0], b_ll[0]), max(a_ll[0], b_ll[0])
                )
                # M ⊥ (plane through N and the Z axis); project A, B on it
                m = pt.cross(n, (0.0, 0.0, 1.0))
                m_a = pt.dot(m, a)
                m_b = pt.dot(m, b)
                m_error = 6.06638e-16 * n_norm + 6.83174e-31
                if m_a * m_b < 0 or abs(m_a) <= m_error or abs(m_b) <= m_error:
                    # min/max latitude may occur in the edge interior
                    max_lat = min(
                        math.atan2(
                            math.sqrt(n[0] * n[0] + n[1] * n[1]), abs(n[2])
                        )
                        + 3 * DBL_EPSILON,
                        _HALF_PI,
                    )
                    d_ab = (a[0] - b[0], a[1] - b[1], a[2] - b[2])
                    lat_budget_z = (
                        0.5 * math.sqrt(pt.dot(d_ab, d_ab)) * math.sin(max_lat)
                    )
                    lat_budget = 2 * math.asin(
                        min((1 + 4 * DBL_EPSILON) * lat_budget_z, 1.0)
                    )
                    max_delta = 0.5 * (lat_budget - lat_ab.length()) + DBL_EPSILON
                    lo, hi = lat_ab.lo, lat_ab.hi
                    if m_a <= m_error and m_b >= -m_error:
                        hi = min(max_lat, hi + max_delta)
                    if m_b <= m_error and m_a >= -m_error:
                        lo = max(-max_lat, lo - max_delta)
                    lat_ab = R1Interval(lo, hi)
                self._bound = self._bound.union(Rect(lat_ab, lng_ab))
        self._a = b
        self._a_ll = b_ll

    def get_bound(self) -> Rect:
        """Accumulated bound expanded by 2ε latitude (conversion-error
        margin; ref rect_bounder.rs:226-264)."""
        return self._bound.expanded(2 * DBL_EPSILON, 0.0).polar_closure()


def expand_for_subregions(bound: Rect) -> Rect:
    """Expand a get_bound() result so it contains the bound of ANY
    subregion (ref rect_bounder.rs:267-397, constants verbatim)."""
    if bound.is_empty():
        return bound
    lng_gap = max(0.0, PI - bound.lng.length() - 2.5 * DBL_EPSILON)
    min_abs_lat = max(bound.lat.lo, -bound.lat.hi)
    lat_gap_south = _HALF_PI + bound.lat.lo
    lat_gap_north = _HALF_PI - bound.lat.hi
    if min_abs_lat >= 0:
        if 2 * min_abs_lat + lng_gap < 1.354e-15:
            return Rect.full()
    elif lng_gap >= _HALF_PI:
        if lat_gap_south + lat_gap_north < 1.687e-15:
            return Rect.full()
    else:
        if max(lat_gap_south, lat_gap_north) * lng_gap < 1.765e-15:
            return Rect.full()
    lat_expansion = 9 * DBL_EPSILON
    lng_expansion = PI if lng_gap <= 0 else 0.0
    return bound.expanded(lat_expansion, lng_expansion).polar_closure()
