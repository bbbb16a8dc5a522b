"""Hypothesis property suites for the 2D edge-clipping kernels
(reference contracts: edge_clipping.rs:29-59 error constants,
edge_clipping.rs:530-556 clip_edge_bound, edge_clipping.rs:602-669
face_segments). The r5 property pass over edges found a real
stable_sign bug, so these generators deliberately stress degenerate
shapes: zero-length edges, axis-parallel edges, clip rects that
degenerate to segments/points, and endpoints just outside the biunit
square."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from rust_s2_spark.kernels.edge_clipping import (
    EDGE_CLIP_ERROR_UV_COORD,
    FACE_CLIP_ERROR_RADIANS,
    FACE_CLIP_ERROR_UV_DIST,
    R2Rect,
    clip_edge,
    clip_edge_bound,
    face_segments,
    face_uv_to_xyz,
    valid_face_xyz_to_uv,
)

# coordinates in and slightly beyond the biunit square (the contract
# allows endpoints outside it by <= 1e-10)
coord = st.floats(
    min_value=-1.0 - 1e-10, max_value=1.0 + 1e-10, allow_nan=False
)
frac = st.floats(min_value=0.0, max_value=1.0, allow_nan=False)


def _rect_from(x0, x1, y0, y1) -> R2Rect:
    return R2Rect(min(x0, x1), max(x0, x1), min(y0, y1), max(y0, y1))


def _contains(r: R2Rect, p, eps: float) -> bool:
    return (
        r.x_lo - eps <= p[0] <= r.x_hi + eps
        and r.y_lo - eps <= p[1] <= r.y_hi + eps
    )


@settings(max_examples=400, deadline=None)
@given(
    ax=coord, ay=coord, bx=coord, by=coord,
    cx0=coord, cx1=coord, cy0=coord, cy1=coord,
    ts=st.lists(frac, min_size=4, max_size=8),
)
def test_clip_edge_bound_containment(ax, ay, bx, by, cx0, cx1, cy0, cy1, ts):
    """If intersecting: the returned bound lies inside clip∩bound(AB)
    (to EDGE_CLIP_ERROR_UV_COORD), and every sampled point of AB that
    is strictly inside the clip lies inside the returned bound
    (contract: edge_clipping.rs:531-537)."""
    a, b = (ax, ay), (bx, by)
    clip = _rect_from(cx0, cx1, cy0, cy1)
    bound0 = R2Rect.from_points([a, b])
    got, intersects = clip_edge_bound(a, b, clip, bound0)
    eps = EDGE_CLIP_ERROR_UV_COORD
    if intersects:
        assert got.x_lo <= got.x_hi and got.y_lo <= got.y_hi
        # inside the clip window and inside the original edge bound
        assert got.x_lo >= min(clip.x_lo, bound0.x_lo) - eps
        assert got.x_hi <= max(clip.x_hi, bound0.x_hi) + eps
        assert got.x_lo >= bound0.x_lo - eps and got.x_hi <= bound0.x_hi + eps
        assert got.y_lo >= bound0.y_lo - eps and got.y_hi <= bound0.y_hi + eps
        assert got.x_lo >= clip.x_lo - eps and got.x_hi <= clip.x_hi + eps
        assert got.y_lo >= clip.y_lo - eps and got.y_hi <= clip.y_hi + eps
    for t in ts:
        p = (a[0] + (b[0] - a[0]) * t, a[1] + (b[1] - a[1]) * t)
        if _contains(clip, p, -eps):  # strictly inside by the error margin
            # ... then AB intersects the clip and p must be in the bound
            assert intersects
            assert _contains(got, p, eps)


@settings(max_examples=300, deadline=None)
@given(
    ax=coord, ay=coord, bx=coord, by=coord,
    cx0=coord, cx1=coord, cy0=coord, cy1=coord,
    sx0=frac, sx1=frac, sy0=frac, sy1=frac,
)
def test_clip_edge_bound_monotone_in_clip(
    ax, ay, bx, by, cx0, cx1, cy0, cy1, sx0, sx1, sy0, sy1
):
    """Clipping to a SUB-rectangle of the clip window can only shrink
    the result: bound(AB, inner) ⊆ bound(AB, outer) + ε, and inner
    intersecting implies outer intersecting.

    Edges with a NONZERO-BUT-SUBNORMAL coordinate span are excluded
    (zero spans keep the exact axis-parallel branches): the ε-based
    error contract this property leans on (EDGE_CLIP_ERROR_UV_COORD =
    2.25·ε, reference edge_clipping.rs:29-35) is a relative-error
    analysis, and IEEE relative rounding guarantees do not exist in
    the gradual-underflow range — interpolating across a 4.5e-311
    x-span produced a 7.6e-14 y discrepancy (hypothesis-discovered
    2026-08-18), ~76× the constant, exactly as the reference's own
    formula would. The reference states and tests its contract for
    normalized UV arithmetic only."""
    from hypothesis import assume

    for span in (abs(bx - ax), abs(by - ay)):
        assume(span == 0.0 or span >= 1e-300)
    a, b = (ax, ay), (bx, by)
    outer = _rect_from(cx0, cx1, cy0, cy1)
    # inner rect: shrink outer by fractional insets from both sides
    w, h = outer.x_hi - outer.x_lo, outer.y_hi - outer.y_lo
    lo_x = outer.x_lo + 0.5 * sx0 * w
    hi_x = outer.x_hi - 0.5 * sx1 * w
    lo_y = outer.y_lo + 0.5 * sy0 * h
    hi_y = outer.y_hi - 0.5 * sy1 * h
    inner = R2Rect(lo_x, hi_x, lo_y, hi_y)
    bound0 = R2Rect.from_points([a, b])
    got_o, int_o = clip_edge_bound(a, b, outer, bound0)
    got_i, int_i = clip_edge_bound(a, b, inner, bound0)
    eps = 2 * EDGE_CLIP_ERROR_UV_COORD
    if int_i:
        assert int_o
        assert got_i.x_lo >= got_o.x_lo - eps
        assert got_i.x_hi <= got_o.x_hi + eps
        assert got_i.y_lo >= got_o.y_lo - eps
        assert got_i.y_hi <= got_o.y_hi + eps


@settings(max_examples=300, deadline=None)
@given(ax=coord, ay=coord, bx=coord, by=coord,
       cx0=coord, cx1=coord, cy0=coord, cy1=coord)
def test_clip_edge_endpoints_consistent_with_bound(
    ax, ay, bx, by, cx0, cx1, cy0, cy1
):
    """clip_edge returns the clipped segment's endpoints: both must lie
    in the clip window (to ε) and on the line AB (cross-product test to
    the same scaled tolerance)."""
    a, b = (ax, ay), (bx, by)
    clip = _rect_from(cx0, cx1, cy0, cy1)
    pa, pb, ok = clip_edge(a, b, clip)
    if not ok:
        return
    eps = EDGE_CLIP_ERROR_UV_COORD
    for p in (pa, pb):
        assert _contains(clip, p, eps)
        # colinearity: |(b-a) × (p-a)| ≤ |b-a|·ε (distance-to-line form)
        dx, dy = b[0] - a[0], b[1] - a[1]
        cross = dx * (p[1] - a[1]) - dy * (p[0] - a[0])
        assert abs(cross) <= math.hypot(dx, dy) * 4 * eps + 1e-300


# ---- face_segments chain continuity (edge_clipping.rs:602-669) -------------

unit = st.floats(min_value=-1.0, max_value=1.0, allow_nan=False)


def _norm(v):
    # rescale by max-abs first: squaring a ~1e-160 component underflows
    # to subnormal and sqrt() then returns a half-precision norm, so the
    # "normalized" vector violates face_segments' unit-length contract
    m = max(abs(v[0]), abs(v[1]), abs(v[2]))
    if m == 0.0 or not math.isfinite(m):
        return None
    w = (v[0] / m, v[1] / m, v[2] / m)
    n = math.sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2])
    return (w[0] / n, w[1] / n, w[2] / n)


def _angle(p, q):
    # stable near 0 (acos(dot) can't resolve below ~1e-8); exact for
    # antipodal checks too since chord length saturates at 2
    chord = math.sqrt(
        (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2 + (p[2] - q[2]) ** 2
    )
    return 2.0 * math.asin(min(1.0, 0.5 * chord))


@settings(max_examples=300, deadline=None)
@given(x1=unit, y1=unit, z1=unit, x2=unit, y2=unit, z2=unit)
def test_face_segments_chain(x1, y1, z1, x2, y2, z2):
    """The segments form a continuous path from A to B: endpoints map
    back to A/B within FACE_CLIP_ERROR_RADIANS, consecutive segments
    join at the same sphere point on different faces, and every vertex
    stays in the biunit rectangle (contract: edge_clipping.rs:596-601)."""
    a = _norm((x1, y1, z1))
    b = _norm((x2, y2, z2))
    if a is None or b is None:
        return
    if _angle(a, b) > math.pi - 1e-6:  # contract excludes antipodal pairs
        return
    segs = face_segments(a, b)
    assert len(segs) >= 1
    first, last = segs[0], segs[-1]
    a_prime = _norm(face_uv_to_xyz(first.face, first.a[0], first.a[1]))
    b_prime = _norm(face_uv_to_xyz(last.face, last.b[0], last.b[1]))
    assert _angle(a, a_prime) <= FACE_CLIP_ERROR_RADIANS * 2
    assert _angle(b, b_prime) <= FACE_CLIP_ERROR_RADIANS * 2
    for i, s in enumerate(segs):
        for p in (s.a, s.b):
            assert -1.0 - 1e-12 <= p[0] <= 1.0 + 1e-12
            assert -1.0 - 1e-12 <= p[1] <= 1.0 + 1e-12
        if i == 0:
            continue
        prev = segs[i - 1]
        assert prev.face != s.face
        p_prev = _norm(face_uv_to_xyz(prev.face, prev.b[0], prev.b[1]))
        p_cur = _norm(face_uv_to_xyz(s.face, s.a[0], s.a[1]))
        assert _angle(p_prev, p_cur) <= 1e-12
        # the junction lies on the exact great circle AB (uv-distance
        # form of the contract, FACE_CLIP_ERROR_UV_DIST on its face)
        u, v = valid_face_xyz_to_uv(s.face, p_cur)
        assert math.hypot(u - s.a[0], v - s.a[1]) <= FACE_CLIP_ERROR_UV_DIST
