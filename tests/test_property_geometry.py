"""Hypothesis property tests over the wrap-aware interval and rect
algebra (the randomized half of the reference's geometry test strategy,
next to the 144 dumped rect pairs and 323 cap verdicts)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from rust_s2_spark.geometry.intervals import S1Interval
from rust_s2_spark.geometry.rect import Rect

PI = math.pi

ang = st.floats(min_value=-PI, max_value=PI, allow_nan=False)
lat_deg = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
lng_deg = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)


def _iv(a: float, b: float) -> S1Interval:
    return S1Interval.from_point_pair(a, b)


@settings(max_examples=200, deadline=None)
@given(a=ang, b=ang, p=ang)
def test_s1_union_contains_both_and_point_membership(a, b, p):
    x = _iv(a, b)
    y = _iv(b, p)
    u = x.union(y)
    assert u.contains(a) and u.contains(b) and u.contains(p)
    # union is an upper bound of both inputs
    for q in (a, b):
        assert not x.contains(q) or u.contains(q)


@settings(max_examples=200, deadline=None)
@given(a=ang, b=ang, c=ang, d=ang, p=ang)
def test_s1_intersection_covers_true_intersection(a, b, c, d, p):
    """The guaranteed direction of the reference semantics: the returned
    interval CONTAINS the exact intersection (which can be two disjoint
    arcs when an input wraps — in that case the single-interval result
    may also cover points outside both inputs)."""
    x, y = _iv(a, b), _iv(c, d)
    i = x.intersection(y)
    if x.contains(p) and y.contains(p):
        assert i.contains(p)


@settings(max_examples=200, deadline=None)
@given(a=ang, b=ang, p=ang)
def test_s1_add_point_grows_monotonically(a, b, p):
    x = _iv(a, b)
    g = x.add_point(p)
    assert g.contains(p)
    assert g.contains(a) and g.contains(b)


@settings(max_examples=150, deadline=None)
@given(
    lat1=lat_deg, lng1=lng_deg, lat2=lat_deg, lng2=lng_deg,
    plat=lat_deg, plng=lng_deg,
)
def test_rect_union_intersection_membership(lat1, lng1, lat2, lng2, plat, plng):
    """Non-wrapping rects only: for an INVERTED (dateline-crossing) lng
    interval the exact intersection can be two disjoint arcs and the
    single-interval result is legitimately not contained in both inputs
    (reference semantics) — those cases are pinned by the 144 dumped
    golden pairs instead."""
    r1 = Rect.from_degrees(
        min(lat1, lat2), min(lng1, lng2), max(lat1, lat2), max(lng1, lng2)
    )
    r2 = Rect.from_degrees(
        min(plat, lat1), min(plng, lng1), max(plat, lat1), max(plng, lng1)
    )
    u = r1.union(r2)
    i = r1.intersection(r2)
    la, ln = math.radians(plat), math.radians(plng)
    in1 = r1.contains_latlng_rad(la, ln)
    in2 = r2.contains_latlng_rad(la, ln)
    if in1 or in2:
        assert u.contains_latlng_rad(la, ln)
    if not i.is_empty() and i.contains_latlng_rad(la, ln):
        assert in1 and in2
    # containment consistency: union contains both rects
    assert u.contains_rect(r1) and u.contains_rect(r2)
    if not i.is_empty():
        assert r1.contains_rect(i) and r2.contains_rect(i)


@settings(max_examples=150, deadline=None)
@given(lat1=lat_deg, lng1=lng_deg, lat2=lat_deg, lng2=lng_deg)
def test_rect_expand_contains_original(lat1, lng1, lat2, lng2):
    r = Rect.from_degrees(min(lat1, lat2), lng1, max(lat1, lat2), lng2)
    if r.is_empty():
        return
    e = r.expanded(0.1, 0.1)
    assert e.contains_rect(r)
    assert e.area() >= r.area()
