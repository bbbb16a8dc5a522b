"""Hypothesis property suites for RectBounder (reference contracts:
rect_bounder.rs:83-264 — the bound contains every point of every added
edge — and rect_bounder.rs:267-397 expand_for_subregions — if loop L
contains loop S then the expanded bound of L contains the bound of S).
Subregion chains are generated ON the parent chain's edges so S ⊆ L
holds by construction."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from rust_s2_spark.geometry.rect_bounder import (
    RectBounder,
    expand_for_subregions,
)

_EPS = 2.220446049250313e-16  # DBL_EPSILON

lat_deg = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
lng_deg = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
frac = st.floats(min_value=0.0, max_value=1.0, allow_nan=False)


def _pt(lat, lng):
    la, lo = math.radians(lat), math.radians(lng)
    return (
        math.cos(lo) * math.cos(la),
        math.sin(lo) * math.cos(la),
        math.sin(la),
    )


def _norm(v):
    n = math.sqrt(v[0] ** 2 + v[1] ** 2 + v[2] ** 2)
    return (v[0] / n, v[1] / n, v[2] / n)


def _interp(a, b, t):
    """Point on the geodesic edge AB (chord interpolation + normalize —
    stays exactly on the great circle through A and B)."""
    return _norm(
        (
            a[0] + (b[0] - a[0]) * t,
            a[1] + (b[1] - a[1]) * t,
            a[2] + (b[2] - a[2]) * t,
        )
    )


def _latlng(p):
    return math.atan2(p[2], math.hypot(p[0], p[1])), math.atan2(p[1], p[0])


def _lng_slack(points):
    """Representation error of a sampled point's longitude: ~ulps of
    xyz error amplified by 1/cos(lat) near the poles."""
    cmin = min(max(math.hypot(p[0], p[1]), 1e-3) for p in points)
    return 8 * _EPS / cmin


def _bound_of(chain):
    rb = RectBounder()
    for p in chain:
        rb.add_point(p)
    return rb.get_bound()


def _chain(lats, lngs):
    pts = [_pt(la, lo) for la, lo in zip(lats, lngs)]
    # drop consecutive near-antipodal pairs — AddPoint's contract
    # returns Full for those, which is correct but vacuous here
    out = [pts[0]]
    for p in pts[1:]:
        dot = sum(x * y for x, y in zip(out[-1], p))
        if dot > -1.0 + 1e-9:
            out.append(p)
    return out


@settings(max_examples=200, deadline=None)
@given(
    lats=st.lists(lat_deg, min_size=2, max_size=6),
    lngs=st.lists(lng_deg, min_size=6, max_size=6),
    ts=st.lists(frac, min_size=5, max_size=9),
)
def test_bound_contains_edge_samples(lats, lngs, ts):
    """get_bound() contains the LatLng of every sampled point on every
    edge of the chain (rect_bounder.rs:83-110 AddPoint guarantee)."""
    chain = _chain(lats, lngs[: len(lats)])
    if len(chain) < 2:
        return
    # the reference documents that TRUE coordinates of contained points
    # may lie up to DBL_EPSILON outside the returned bound (it only
    # guarantees containment of the rounded vertex coords,
    # rect_bounder.rs:226-251); our renormalized samples add ~1 ulp, so
    # test against a few-epsilon expansion
    bound = _bound_of(chain).expanded(4 * _EPS, _lng_slack(chain))
    for a, b in zip(chain, chain[1:]):
        for t in ts:
            la, lo = _latlng(_interp(a, b, t))
            assert bound.contains_latlng_rad(la, lo), (la, lo, bound)


def _tangent_frame(c):
    """Orthonormal basis of the tangent plane at unit vector c."""
    ref = (1.0, 0.0, 0.0) if abs(c[0]) < 0.9 else (0.0, 1.0, 0.0)
    e1 = _norm(
        (
            ref[1] * c[2] - ref[2] * c[1],
            ref[2] * c[0] - ref[0] * c[2],
            ref[0] * c[1] - ref[1] * c[0],
        )
    )
    e2 = (
        c[1] * e1[2] - c[2] * e1[1],
        c[2] * e1[0] - c[0] * e1[2],
        c[0] * e1[1] - c[1] * e1[0],
    )
    return e1, e2


def _ngon(c, r, n, phase):
    """Regular spherical n-gon of circumradius r (radians) around c."""
    e1, e2 = _tangent_frame(c)
    cr, sr = math.cos(r), math.sin(r)
    out = []
    for i in range(n):
        th = phase + 2.0 * math.pi * i / n
        d = (
            math.cos(th) * e1[0] + math.sin(th) * e2[0],
            math.cos(th) * e1[1] + math.sin(th) * e2[1],
            math.cos(th) * e1[2] + math.sin(th) * e2[2],
        )
        out.append(_norm((cr * c[0] + sr * d[0], cr * c[1] + sr * d[1], cr * c[2] + sr * d[2])))
    return out


@settings(max_examples=300, deadline=None)
@given(
    clat=lat_deg,
    clng=lng_deg,
    r=st.floats(min_value=0.01, max_value=1.5, allow_nan=False),
    n=st.integers(min_value=3, max_value=7),
    m=st.integers(min_value=3, max_value=7),
    shrink=st.floats(min_value=0.05, max_value=0.95, allow_nan=False),
    ph1=st.floats(min_value=0.0, max_value=6.283, allow_nan=False),
    ph2=st.floats(min_value=0.0, max_value=6.283, allow_nan=False),
)
def test_expand_for_subregions_contains_subregion_bound(
    clat, clng, r, n, m, shrink, ph1, ph2
):
    """Constructive L ⊇ S: L is a regular spherical n-gon of
    circumradius r (< π/2, so caps are geodesically convex) around C;
    S is an m-gon whose circumradius is under L's INSCRIBED radius
    (tan r_in = tan r · cos(π/n)), so S ⊆ incircle(L) ⊆ L as regions.
    Then ExpandForSubregions(bound(L)) must contain bound(S)
    (rect_bounder.rs:267-397)."""
    c = _pt(clat, clng)
    # the reference contract requires that L contain NEITHER pole
    # (rect_bounder.rs:263-266) — keep the circumscribed cap clear
    r = min(r, math.pi / 2 - abs(math.radians(clat)) - 0.02)
    if r < 0.01:
        return
    loop_l = _ngon(c, r, n, ph1)
    r_in = math.atan(math.tan(r) * math.cos(math.pi / n))
    loop_s = _ngon(c, 0.95 * shrink * r_in, m, ph2)
    expanded = expand_for_subregions(_bound_of(loop_l + [loop_l[0]])).expanded(
        4 * _EPS, _lng_slack(loop_l + loop_s)
    )
    sub_bound = _bound_of(loop_s + [loop_s[0]])
    assert expanded.contains_rect(sub_bound), (expanded, sub_bound)
