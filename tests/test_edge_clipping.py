"""Port of the reference's edge_clipping test suite
(/root/reference/src/s2/edge_clipping.rs:776-1290): the deterministic
intersects_face / intersects_opposite_edges / exit_axis / exit_point
cases verbatim, plus the face-clipping and rect-clipping property
tests re-run with a seeded RNG."""

from __future__ import annotations

import math

import numpy as np
import pytest

import rust_s2_spark.kernels.edge_clipping as ec

DBL_EPSILON = ec.DBL_EPSILON
SQRT_2_3 = math.sqrt(2.0 / 3.0)
SQRT_4_3 = math.sqrt(4.0 / 3.0)


def _norm3(v):
    return math.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])


def _unit(v):
    n = _norm3(v)
    return (v[0] / n, v[1] / n, v[2] / n)


def _angle(a, b):
    c = ec._cross(a, b)
    return math.atan2(_norm3(c), ec._dot(a, b))


def face_uv_to_point(f, u, v):
    return _unit(ec.face_uv_to_xyz(f, u, v))


# -- deterministic cases (edge_clipping.rs:1044-1210) -------------------------


def test_intersects_face():
    cases = [
        ((2.05335e-06, 3.91604e-22, 2.90553e-06), False),
        ((-3.91604e-22, -2.05335e-06, -2.90553e-06), False),
        ((0.169258, -0.169258, 0.664013), False),
        ((SQRT_2_3, -SQRT_2_3, 3.88578e-16), True),
        ((3.88578e-16, -SQRT_2_3, SQRT_2_3), True),
    ]
    for n, want in cases:
        assert ec.intersects_face(n) == want, n


def test_intersects_opposite_edges():
    cases = [
        ((0.169258, -0.169258, 0.664013), False),
        ((0.169258, -0.169258, -0.664013), False),
        ((SQRT_4_3, 0.0, -SQRT_4_3), True),
        ((SQRT_4_3, 0.0, SQRT_4_3), True),
        ((-SQRT_2_3, -SQRT_2_3, 1.66533453694e-16), False),
        ((SQRT_2_3, SQRT_2_3, -1.66533453694e-16), False),
    ]
    for n, want in cases:
        assert ec.intersects_opposite_edges(n) == want, n


def test_exit_axis():
    cases = [
        ((0.0, -SQRT_2_3, SQRT_2_3), ec.AXIS_U),
        ((0.0, SQRT_4_3, -SQRT_4_3), ec.AXIS_U),
        ((-SQRT_4_3, SQRT_4_3, 0.0), ec.AXIS_V),
        ((SQRT_4_3, SQRT_4_3, 0.0), ec.AXIS_V),
        ((SQRT_2_3, -SQRT_2_3, 0.0), ec.AXIS_V),
        ((1.67968702783622, 0.0, 0.870988820096491), ec.AXIS_V),
        ((0.0, math.sqrt(2.0), math.sqrt(2.0)), ec.AXIS_U),
    ]
    for n, want in cases:
        assert ec.exit_axis(n) == want, n


def test_exit_point():
    cases = [
        ((-3.88578058618805e-16, -SQRT_2_3, SQRT_2_3), ec.AXIS_U, (-1.0, 1.0)),
        ((SQRT_4_3, -SQRT_4_3, 0.0), ec.AXIS_V, (-1.0, -1.0)),
        ((-SQRT_4_3, -SQRT_4_3, 0.0), ec.AXIS_V, (-1.0, 1.0)),
        ((-6.66134e-16, SQRT_4_3, -SQRT_4_3), ec.AXIS_U, (1.0, 1.0)),
    ]
    for n, axis, want in cases:
        got = ec.exit_point(n, axis)
        assert got[0] == pytest.approx(want[0], abs=1e-14)
        assert got[1] == pytest.approx(want[1], abs=1e-14)


# -- face clipping property test (edge_clipping.rs:805-899,1214-1254) ---------


def _random_point(rng):
    v = rng.normal(size=3)
    return _unit(tuple(v))


def _log_uniform(rng, lo, hi):
    return math.exp(rng.uniform(math.log(lo), math.log(hi)))


def _perturbed_corner_or_midpoint(rng, p, q):
    a = ec._add(ec._mul(p, rng.uniform(-1, 2)), ec._mul(q, rng.uniform(-1, 2)))
    r = rng.uniform()
    if r < 0.1:
        a = ec._add(a, ec._mul(_random_point(rng), _log_uniform(rng, 1e-300, 1.0)))
    elif r < 0.55:
        a = ec._add(a, ec._mul(_random_point(rng), 4.0 * DBL_EPSILON))
    else:
        a = ec._add(a, ec._mul(_random_point(rng), _log_uniform(rng, 1e-25, 1e-10)))
    if ec._dot(a, a) < 2.2250738585072014e-308:
        return _perturbed_corner_or_midpoint(rng, p, q)
    return _unit(a)


def _check_face_clipping(rng, a_raw, b_raw):
    a = _unit(a_raw)
    b = _unit(b_raw)
    if _angle(a, ec._mul(b, -1.0)) < 1e-15:
        return
    segments = ec.face_segments(a, b)
    n = len(segments)
    assert n >= 1

    a_prime = face_uv_to_point(segments[0].face, *segments[0].a)
    assert _angle(a, a_prime) <= ec.FACE_CLIP_ERROR_RADIANS
    b_prime = face_uv_to_point(segments[-1].face, *segments[-1].b)
    assert _angle(b, b_prime) <= ec.FACE_CLIP_ERROR_RADIANS

    au, av = ec.valid_face_xyz_to_uv(segments[0].face, a)
    assert math.hypot(au - segments[0].a[0], av - segments[0].a[1]) <= (
        ec.FACE_CLIP_ERROR_UV_DIST
    )
    bu, bv = ec.valid_face_xyz_to_uv(segments[-1].face, b)
    assert math.hypot(bu - segments[-1].b[0], bv - segments[-1].b[1]) <= (
        ec.FACE_CLIP_ERROR_UV_DIST
    )

    norm = _unit(ec.point_cross(a, b))
    a_tan = ec._cross(norm, a)
    b_tan = ec._cross(b, norm)

    for i, seg in enumerate(segments):
        for u, v in (seg.a, seg.b):
            assert -1 - 1e-15 <= u <= 1 + 1e-15 and -1 - 1e-15 <= v <= 1 + 1e-15
        if i == 0:
            continue
        assert segments[i - 1].face != seg.face
        prev = face_uv_to_point(segments[i - 1].face, *segments[i - 1].b)
        cur = face_uv_to_point(seg.face, *seg.a)
        assert _angle(prev, cur) < 1e-10
        p = cur
        assert abs(ec._dot(p, norm)) <= ec.FACE_CLIP_ERROR_RADIANS
        assert ec._dot(p, a_tan) >= -ec.FACE_CLIP_ERROR_RADIANS
        assert ec._dot(p, b_tan) >= -ec.FACE_CLIP_ERROR_RADIANS

    padding = 0.0 if rng.uniform() < 0.1 else _log_uniform(rng, 1e-15, 1e-10)
    for f in range(6):
        a_uv, b_uv, intersects = ec.clip_to_padded_face(a, b, f, padding)
        if not intersects:
            continue
        a_clip = face_uv_to_point(f, *a_uv)
        b_clip = face_uv_to_point(f, *b_uv)
        assert abs(ec._dot(a_clip, norm)) <= ec.FACE_CLIP_ERROR_RADIANS
        assert abs(ec._dot(b_clip, norm)) <= ec.FACE_CLIP_ERROR_RADIANS
        if _angle(a_clip, a) > ec.FACE_CLIP_ERROR_RADIANS:
            assert max(abs(a_uv[0]), abs(a_uv[1])) == pytest.approx(
                1.0 + padding, abs=1e-14
            )
        if _angle(b_clip, b) > ec.FACE_CLIP_ERROR_RADIANS:
            assert max(abs(b_uv[0]), abs(b_uv[1])) == pytest.approx(
                1.0 + padding, abs=1e-14
            )


def test_face_clipping():
    rng = np.random.default_rng(20260816)
    pairs = [
        ((1.0, -0.5, -0.5), (1.0, 0.5, 0.5)),
        ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0)),
        ((0.75, 0.0, -1.0), (0.75, 0.0, 1.0)),
        ((1.0, 0.0, 0.75), (0.0, 1.0, 0.75)),
        ((1.0, 0.9, 0.95), (-1.0, 0.95, 0.9)),
    ]
    for a, b in pairs:
        _check_face_clipping(rng, a, b)
        _check_face_clipping(rng, b, a)

    corners = [(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)]
    for _ in range(300):
        f = int(rng.integers(0, 6))
        i = int(rng.integers(0, 4))
        j = (i + 1) & 3
        p = face_uv_to_point(f, *corners[i])
        q = face_uv_to_point(f, *corners[j])
        a = _perturbed_corner_or_midpoint(rng, p, q)
        b = _perturbed_corner_or_midpoint(rng, p, q)
        _check_face_clipping(rng, a, b)


# -- rect clipping property test (edge_clipping.rs:901-1042,1256-1289) --------


def _rect_contains(r, p, eps=0.0):
    return (
        r.x_lo - eps <= p[0] <= r.x_hi + eps
        and r.y_lo - eps <= p[1] <= r.y_hi + eps
    )


def _expand(r, margin):
    out = ec.R2Rect(r.x_lo - margin, r.x_hi + margin, r.y_lo - margin, r.y_hi + margin)
    if out.x_lo > out.x_hi or out.y_lo > out.y_hi:
        return ec.EMPTY_R2RECT
    return out


def _get_fraction(x, a, b):
    error_dist = ec.EDGE_CLIP_ERROR_UV_DIST + ec.INTERSECT_RECT_ERROR_UV_DIST
    if a == b:
        return 0.0
    dx, dy = b[0] - a[0], b[1] - a[1]
    n = math.hypot(dx, dy)
    dx, dy = dx / n, dy / n
    assert abs((x[0] - a[0]) * (-dy) + (x[1] - a[1]) * dx) <= error_dist
    return (x[0] - a[0]) * dx + (x[1] - a[1]) * dy


def _check_point_on_boundary(p, a, clip):
    assert _rect_contains(clip, p)
    if p != a:
        toward_a = (math.nextafter(p[0], a[0]), math.nextafter(p[1], a[1]))
        assert not _rect_contains(clip, toward_a)


def _choose_endpoint_r1(rng, lo, hi):
    if rng.uniform() < 0.2:
        return lo if rng.uniform() < 0.5 else hi
    c = int(rng.integers(0, 3))
    if c == 0:
        return lo - rng.uniform()
    if c == 1:
        return hi + rng.uniform()
    return lo if lo >= hi else rng.uniform(lo, hi)


def _choose_rect_endpoint(rng, clip):
    if rng.uniform() < 0.1:
        diag = int(rng.integers(0, 2))
        t = rng.uniform(-1, 2)
        v = [
            (clip.x_lo, clip.y_lo),
            (clip.x_hi, clip.y_lo),
            (clip.x_hi, clip.y_hi),
            (clip.x_lo, clip.y_hi),
        ]
        p0, p1 = v[diag], v[diag + 2]
        return (p0[0] * (1 - t) + p1[0] * t, p0[1] * (1 - t) + p1[1] * t)
    return (
        _choose_endpoint_r1(rng, clip.x_lo, clip.x_hi),
        _choose_endpoint_r1(rng, clip.y_lo, clip.y_hi),
    )


def _choose_rect_point(rng, a, b):
    if rng.uniform() < 0.2:
        return a if rng.uniform() < 0.5 else b
    if rng.uniform() < 1.0 / 3.0:
        t = rng.uniform()
        return (a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1]))
    return (
        a[0] + rng.uniform() * (b[0] - a[0]),
        a[1] + rng.uniform() * (b[1] - a[1]),
    )


def _check_clip_edge(rng, a, b, clip):
    error_dist = ec.EDGE_CLIP_ERROR_UV_DIST + ec.INTERSECT_RECT_ERROR_UV_DIST
    a_clip, b_clip, intersects = ec.clip_edge(a, b, clip)
    if not intersects:
        shrunk = _expand(clip, -error_dist)
        if shrunk != ec.EMPTY_R2RECT:
            assert not ec.edge_intersects_rect(a, b, shrunk)
    else:
        assert ec.edge_intersects_rect(a, b, _expand(clip, error_dist))
        assert _get_fraction(a_clip, a, b) <= _get_fraction(b_clip, a, b)
        _check_point_on_boundary(a_clip, a, clip)
        _check_point_on_boundary(b_clip, b, clip)

    initial_clip = ec.R2Rect.from_points(
        [_choose_rect_point(rng, a, b), _choose_rect_point(rng, a, b)]
    )
    bound = ec.clipped_edge_bound(a, b, initial_clip)
    if bound == ec.EMPTY_R2RECT or bound.x_lo > bound.x_hi or bound.y_lo > bound.y_hi:
        return
    max_bound = ec.R2Rect(
        max(bound.x_lo, clip.x_lo),
        min(bound.x_hi, clip.x_hi),
        max(bound.y_lo, clip.y_lo),
        min(bound.y_hi, clip.y_hi),
    )
    bound2, intersects2 = ec.clip_edge_bound(a, b, clip, bound)
    if not intersects2:
        shrunk = _expand(max_bound, -error_dist)
        if shrunk != ec.EMPTY_R2RECT and shrunk.x_lo <= shrunk.x_hi and shrunk.y_lo <= shrunk.y_hi:
            assert not ec.edge_intersects_rect(a, b, shrunk)
    else:
        assert ec.edge_intersects_rect(a, b, _expand(max_bound, error_dist))
        ai = 1 if a[0] > b[0] else 0
        aj = 1 if a[1] > b[1] else 0
        _check_point_on_boundary(bound2.vertex_ij(ai, aj), a, max_bound)
        _check_point_on_boundary(bound2.vertex_ij(1 - ai, 1 - aj), b, max_bound)


def _check_edge_clipping_rect(rng, clip, n=250):
    for _ in range(n):
        a = _choose_rect_endpoint(rng, clip)
        b = _choose_rect_endpoint(rng, clip)
        _check_clip_edge(rng, a, b, clip)


def test_clip_edge_random():
    rng = np.random.default_rng(20260817)
    for _ in range(5):
        pts = [(rng.uniform(-1, 1), rng.uniform(-1, 1)) for _ in range(2)]
        _check_edge_clipping_rect(rng, ec.R2Rect.from_points(pts))
    _check_edge_clipping_rect(rng, ec.R2Rect(-0.7, -0.7, 0.3, 0.35))
    _check_edge_clipping_rect(rng, ec.R2Rect(0.2, 0.5, 0.3, 0.3))
    _check_edge_clipping_rect(rng, ec.R2Rect(-0.7, 0.3, 0.0, 0.0))
    _check_edge_clipping_rect(rng, ec.R2Rect(0.3, 0.3, 0.8, 0.8))
