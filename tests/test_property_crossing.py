"""Hypothesis property suite for the crossing predicate cascade
(kernels/edges.py crossing_sign / vertex_crossing /
edge_or_vertex_crossing) under NEAR-DEGENERATE geometry — the
technique that previously found the stable_sign wrong-sign branch and
the subnormal-underflow certainty bug (round 5), aimed at the last
untouched robust kernel (round-7 verdict ask #7).

Three layers:
  1. robust_sign == exact Fraction arithmetic on nearly-coincident /
     nearly-collinear unit triples (the cascade's fast paths must
     never CONTRADICT the exact path they shortcut);
  2. crossing_sign symmetries on near-degenerate edge pairs (tiny
     angular extents, shared-point perturbations at every scale down
     to the subnormal range);
  3. the path-crossing PARITY invariant edge_or_vertex_crossing
     exists to guarantee: for a path x→w→y whose interior vertex w IS
     a loop vertex (forcing the vertex_crossing arbitration), the
     total crossing parity against the loop boundary equals
     inside(x) != inside(y), with containment decided by an
     INDEPENDENT exact-sign oracle (spherical-triangle orientation via
     Fraction determinants — no crossing machinery involved).
"""

from __future__ import annotations

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from rust_s2_spark.kernels import edges as ek

lat_s = st.floats(min_value=-89.0, max_value=89.0, allow_nan=False)
lng_s = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
unit_s = st.floats(min_value=-1.0, max_value=1.0, allow_nan=False)
# perturbation scales from "visible" down to where squared terms
# underflow to subnormals — the regime that broke stable_sign twice
scale_s = st.sampled_from([1e-1, 1e-8, 1e-16, 1e-30, 1e-60, 1e-150, 1e-300])


def _xyz(lat, lng):
    la, lo = np.radians(lat), np.radians(lng)
    return np.array(
        [np.cos(lo) * np.cos(la), np.sin(lo) * np.cos(la), np.sin(la)]
    )


def _unit(v):
    """Normalize with the max-abs rescale first: squaring subnormal
    components underflows and sqrt of the half-precision result is NOT
    a unit vector (round-7 property-suite gotcha)."""
    m = float(np.abs(v).max())
    if m == 0.0:
        return None
    v = v / m
    return v / float(np.sqrt((v * v).sum()))


@settings(max_examples=300, deadline=None)
@given(
    lat=lat_s,
    lng=lng_s,
    d1=st.tuples(unit_s, unit_s, unit_s),
    d2=st.tuples(unit_s, unit_s, unit_s),
    s1=scale_s,
    s2=scale_s,
)
def test_robust_sign_matches_exact_near_degenerate(lat, lng, d1, d2, s1, s2):
    """Nearly-coincident triples: p, p+s1·d1, p+s2·d2 (normalized) —
    triage and stable_sign must either agree with the exact Fraction
    determinant or fall through, never confidently contradict it."""
    p = _xyz(lat, lng)
    b = _unit(p + s1 * np.asarray(d1))
    c = _unit(p + s2 * np.asarray(d2))
    assume(b is not None and c is not None)
    got = int(ek.robust_sign(p[None], b[None], c[None])[0])
    want = ek.exact_sign(p, b, c)
    assert got == want, (p.tolist(), b.tolist(), c.tolist())


@settings(max_examples=200, deadline=None)
@given(
    v=st.tuples(unit_s, unit_s, unit_s),
    w=st.tuples(unit_s, unit_s, unit_s),
    u=st.tuples(unit_s, unit_s, unit_s),
)
def test_robust_sign_matches_exact_raw_components(v, w, u):
    """Raw-component unit vectors (hypothesis shrinks toward axis
    alignments and exact duplicates — true collinearity included)."""
    a, b, c = _unit(np.asarray(v)), _unit(np.asarray(w)), _unit(np.asarray(u))
    assume(a is not None and b is not None and c is not None)
    got = int(ek.robust_sign(a[None], b[None], c[None])[0])
    assert got == ek.exact_sign(a, b, c)


@settings(max_examples=300, deadline=None)
@given(
    lat=lat_s,
    lng=lng_s,
    d1=st.tuples(unit_s, unit_s, unit_s),
    d2=st.tuples(unit_s, unit_s, unit_s),
    d3=st.tuples(unit_s, unit_s, unit_s),
    s=scale_s,
)
def test_crossing_sign_symmetries_near_degenerate(lat, lng, d1, d2, d3, s):
    """Edge pairs with tiny angular extent around a common point:
    crossing_sign must be invariant under swapping the edges and under
    reversing either edge — at every perturbation scale. (The lat/lng
    macro-scale twin lives in test_property_edges.py; this one drives
    the triage/stable/exact boundary.)"""
    p = _xyz(lat, lng)
    a = _unit(p + s * np.asarray(d1))
    b = _unit(p + s * np.asarray(d2))
    c = p
    d = _unit(p + s * np.asarray(d3))
    assume(a is not None and b is not None and d is not None)
    base = int(ek.crossing_sign(a[None], b[None], c[None], d[None])[0])
    assert int(ek.crossing_sign(c[None], d[None], a[None], b[None])[0]) == base
    assert int(ek.crossing_sign(b[None], a[None], c[None], d[None])[0]) == base
    assert int(ek.crossing_sign(a[None], b[None], d[None], c[None])[0]) == base


def test_vertex_crossing_pivot_regression_golden():
    """Pinned falsifying example from this suite's first run: triangle
    (0,0),(1,1),(-1,1) with path (1,0) -> v0 -> (0,1) enters the loop at
    vertex v0 and exits through edge v1v2 — two boundary crossings, even
    parity (both endpoints outside). The pre-fix vertex_crossing grouped
    the b==d and a==d shared-vertex cases under the WRONG sweep pivot
    (a instead of b and vice versa), counting zero crossings at v0."""
    v0, v1, v2 = _xyz(0, 0), _xyz(1, 1), _xyz(-1, 1)
    x, y = _xyz(1, 0), _xyz(0, 1)
    verts = [v0, v1, v2]
    crossings = 0
    for i in range(3):
        u, v = verts[i], verts[(i + 1) % 3]
        crossings += int(ek.edge_or_vertex_crossing(x[None], v0[None], u[None], v[None])[0])
        crossings += int(ek.edge_or_vertex_crossing(v0[None], y[None], u[None], v[None])[0])
    orient = ek.exact_sign(v0, v1, v2)
    ix = _inside_triangle_exact(verts, orient, x)
    iy = _inside_triangle_exact(verts, orient, y)
    assert ix is False and iy is False
    assert crossings % 2 == 0, crossings


def _inside_triangle_exact(verts, orient, p):
    """Exact containment of p in the spherical triangle (CCW side of
    every edge matching the triangle's own orientation), or None if p
    lies exactly on a boundary great circle — an independent oracle
    built only on Fraction determinants."""
    signs = [
        ek.exact_sign(verts[i], verts[(i + 1) % 3], p) for i in range(3)
    ]
    if any(s == 0 for s in signs):
        return None
    return all(s == orient for s in signs)


@settings(max_examples=200, deadline=None)
@given(
    la0=lat_s, lo0=lng_s, la1=lat_s, lo1=lng_s, la2=lat_s, lo2=lng_s,
    lax=lat_s, lox=lng_s, lay=lat_s, loy=lng_s,
    wi=st.integers(min_value=0, max_value=2),
)
def test_edge_or_vertex_crossing_path_parity(
    la0, lo0, la1, lo1, la2, lo2, lax, lox, lay, loy, wi
):
    """THE invariant the vertex arbitration exists for: a path x→w→y
    whose middle vertex w is a triangle vertex (both path segments
    share a vertex with two boundary edges — crossing_sign 0, decided
    by vertex_crossing) must cross the boundary an odd number of times
    iff exactly one endpoint is inside."""
    verts = [_xyz(la0, lo0), _xyz(la1, lo1), _xyz(la2, lo2)]
    x, y = _xyz(lax, lox), _xyz(lay, loy)
    orient = ek.exact_sign(verts[0], verts[1], verts[2])
    assume(orient != 0)
    # endpoints must be distinct from every triangle vertex (a path
    # ENDPOINT on the boundary has no defined side) and strictly off
    # every boundary great circle
    for v in verts:
        assume(not np.array_equal(x, v) and not np.array_equal(y, v))
    ix = _inside_triangle_exact(verts, orient, x)
    iy = _inside_triangle_exact(verts, orient, y)
    assume(ix is not None and iy is not None)
    w = verts[wi]
    # the path's interior segments must not pass EXACTLY through a
    # non-shared triangle vertex (a tangency crossing_sign reports -1
    # by design; parity there is a measure-zero configuration the
    # contract routes through shared vertices instead)
    for v in verts:
        if np.array_equal(v, w):
            continue
        assume(ek.exact_sign(x, w, v) != 0)
        assume(ek.exact_sign(w, y, v) != 0)
    crossings = 0
    for i in range(3):
        u, v = verts[i], verts[(i + 1) % 3]
        crossings += int(
            ek.edge_or_vertex_crossing(x[None], w[None], u[None], v[None])[0]
        )
        crossings += int(
            ek.edge_or_vertex_crossing(w[None], y[None], u[None], v[None])[0]
        )
    assert (crossings % 2 == 1) == (ix != iy), (
        f"parity {crossings} vs inside {ix},{iy}"
    )
