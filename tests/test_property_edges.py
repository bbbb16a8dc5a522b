"""Hypothesis property tests over the edge kernels — the exact
predicates behind the trajectory-crossing join and the distance
operators."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rust_s2_spark.kernels import edges as ek

lat_s = st.floats(min_value=-89.0, max_value=89.0, allow_nan=False)
lng_s = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
t_s = st.floats(min_value=0.0, max_value=1.0, allow_nan=False)


def _xyz(lat, lng):
    la, lo = np.radians(lat), np.radians(lng)
    return np.array([[np.cos(lo) * np.cos(la), np.sin(lo) * np.cos(la), np.sin(la)]])


pt4 = st.tuples(lat_s, lng_s, lat_s, lng_s, lat_s, lng_s, lat_s, lng_s)


@settings(max_examples=200, deadline=None)
@given(p=pt4)
def test_crossing_sign_symmetries(p):
    """crossing_sign (the ROBUST predicate: triage/stable/exact
    cascade) is invariant under swapping the two edges and under
    reversing either edge. simple_crossing deliberately is not tested
    here — it is the raw-double fast path whose answers are unreliable
    within rounding ambiguity by the reference's own contract
    (hypothesis immediately finds subnormal-coordinate flips)."""
    a, b, c, d = (_xyz(p[0], p[1]), _xyz(p[2], p[3]),
                  _xyz(p[4], p[5]), _xyz(p[6], p[7]))
    base = int(ek.crossing_sign(a, b, c, d)[0])
    assert int(ek.crossing_sign(c, d, a, b)[0]) == base
    assert int(ek.crossing_sign(b, a, c, d)[0]) == base
    assert int(ek.crossing_sign(a, b, d, c)[0]) == base


@settings(max_examples=200, deadline=None)
@given(la1=lat_s, lo1=lng_s, la2=lat_s, lo2=lng_s, t=t_s)
def test_interpolate_endpoints_and_great_circle(la1, lo1, la2, lo2, t):
    a, b = _xyz(la1, lo1), _xyz(la2, lo2)
    if float(np.abs(np.cross(a, b)).max()) < 1e-9:
        return  # (anti)parallel: the great circle is degenerate
    p = ek.interpolate(np.array([t]), a, b)
    # unit norm and coplanar with (a, b): the point lies on their
    # great circle
    assert abs(float((p * p).sum()) - 1.0) < 1e-9
    n = np.cross(a, b)
    assert abs(float((p * n).sum())) < 1e-9
    p0 = ek.interpolate(np.array([0.0]), a, b)
    p1 = ek.interpolate(np.array([1.0]), a, b)
    assert np.allclose(p0, a, atol=1e-12) and np.allclose(p1, b, atol=1e-12)


@settings(max_examples=200, deadline=None)
@given(xla=lat_s, xlo=lng_s, la1=lat_s, lo1=lng_s, la2=lat_s, lo2=lng_s)
def test_segment_distance_bounds(xla, xlo, la1, lo1, la2, lo2):
    """dist²(x, segment ab) <= dist²(x, a) and <= dist²(x, b), and the
    projection achieves (numerically) that minimum."""
    x, a, b = _xyz(xla, xlo), _xyz(la1, lo1), _xyz(la2, lo2)
    if float(np.abs(np.cross(a, b)).max()) < 1e-9:
        return
    d2 = float(ek.dist2_point_segment(x, a, b)[0])
    d2a = float(((x - a) ** 2).sum())
    d2b = float(((x - b) ** 2).sum())
    assert d2 <= d2a + 1e-9 and d2 <= d2b + 1e-9
    pr = ek.project_to_segment(x, a, b)
    d2p = float(((x - pr) ** 2).sum())
    assert abs(d2p - d2) < 1e-6


@settings(max_examples=200, deadline=None)
@given(p=pt4)
def test_robust_sign_antisymmetry(p):
    """robust_sign flips under swapping any two arguments and is
    invariant under cyclic rotation — the determinant identities the
    exact-arithmetic fallback must preserve."""
    a, b, c = _xyz(p[0], p[1]), _xyz(p[2], p[3]), _xyz(p[4], p[5])
    s = int(ek.robust_sign(a, b, c)[0])
    assert int(ek.robust_sign(b, a, c)[0]) == -s
    assert int(ek.robust_sign(b, c, a)[0]) == s
    assert int(ek.robust_sign(c, a, b)[0]) == s
