"""Exact edge-clipping layer: geodesic edges ↔ cube faces / uv rects.

Faithful port of the reference's edge-clipping machinery
(/root/reference/src/s2/edge_clipping.rs:29-775 and the stuv helpers it
uses), with the error constants verbatim:

* clip_to_padded_face / clip_to_face — clip a geodesic edge to one face
  (exact sum/exit-axis machinery; edge_clipping.rs:86-156, 330-414)
* clip_edge / clip_edge_bound / clipped_edge_bound — 2D edge vs uv rect
  (edge_clipping.rs:162-577)
* edge_intersects_rect — conservative uv-rect intersection test
* face_segments — subdivide an edge at every face crossing
  (edge_clipping.rs:602-775); the continuous-path and error guarantees
  carry over

These run per-edge on the driver (query-artifact preparation: polyline /
polygon coverings whose output is broadcast) or inside Arrow-batched
UDFs; the per-row hot path stays native Spark.
"""

from __future__ import annotations

import math
from typing import NamedTuple

DBL_EPSILON = 2.220446049250313e-16

# error constants — edge_clipping.rs:33-69, verbatim
EDGE_CLIP_ERROR_UV_COORD = 2.25 * DBL_EPSILON
EDGE_CLIP_ERROR_UV_DIST = 2.25 * DBL_EPSILON
FACE_CLIP_ERROR_RADIANS = 3.0 * DBL_EPSILON
FACE_CLIP_ERROR_UV_DIST = 9.0 * DBL_EPSILON
FACE_CLIP_ERROR_UV_COORD = 9.0 * (1.0 / math.sqrt(2.0)) * DBL_EPSILON
INTERSECT_RECT_ERROR_UV_DIST = 3.0 * math.sqrt(2.0) * DBL_EPSILON

AXIS_U = 0
AXIS_V = 1

Vec = tuple[float, float, float]


class R2Rect(NamedTuple):
    """[x_lo, x_hi] × [y_lo, y_hi]; lo > hi means empty on that axis."""

    x_lo: float
    x_hi: float
    y_lo: float
    y_hi: float

    @staticmethod
    def from_points(pts) -> "R2Rect":
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        return R2Rect(min(xs), max(xs), min(ys), max(ys))

    def vertex_ij(self, i: int, j: int) -> tuple[float, float]:
        return (
            self.x_hi if i else self.x_lo,
            self.y_hi if j else self.y_lo,
        )

    def intersects(self, o: "R2Rect") -> bool:
        return (
            self.x_lo <= o.x_hi
            and o.x_lo <= self.x_hi
            and self.y_lo <= o.y_hi
            and o.y_lo <= self.y_hi
            and self.x_lo <= self.x_hi
            and o.x_lo <= o.x_hi
            and self.y_lo <= self.y_hi
            and o.y_lo <= o.y_hi
        )


EMPTY_R2RECT = R2Rect(1.0, 0.0, 1.0, 0.0)


# -- stuv scalar helpers (ref stuv.rs:40-226) --------------------------------


def face(p: Vec) -> int:
    ax, ay, az = abs(p[0]), abs(p[1]), abs(p[2])
    f, value = 0, p[0]
    if ay > ax:
        f, value = 1, p[1]
    if az > abs(value):
        f, value = 2, p[2]
    if value < 0:
        f += 3
    return f


def valid_face_xyz_to_uv(f: int, p: Vec) -> tuple[float, float]:
    x, y, z = p
    if f == 0:
        return y / x, z / x
    if f == 1:
        return -x / y, z / y
    if f == 2:
        return -x / z, -y / z
    if f == 3:
        return z / x, y / x
    if f == 4:
        return z / y, -x / y
    return -y / z, -x / z


def xyz_to_face_uv(p: Vec) -> tuple[int, float, float]:
    f = face(p)
    u, v = valid_face_xyz_to_uv(f, p)
    return f, u, v


def face_uv_to_xyz(f: int, u: float, v: float) -> Vec:
    if f == 0:
        return (1.0, u, v)
    if f == 1:
        return (-u, 1.0, v)
    if f == 2:
        return (-u, -v, 1.0)
    if f == 3:
        return (-1.0, -v, -u)
    if f == 4:
        return (v, -1.0, -u)
    return (v, u, -1.0)


def face_xyz_to_uvw(f: int, p: Vec) -> Vec:
    x, y, z = p
    if f == 0:
        return (y, z, x)
    if f == 1:
        return (-x, z, y)
    if f == 2:
        return (-x, -y, z)
    if f == 3:
        return (-z, -y, -x)
    if f == 4:
        return (-z, x, -y)
    return (y, x, -z)


_FACE_UVW_FACES = [
    [[4, 1], [5, 2], [3, 0]],
    [[0, 3], [5, 2], [4, 1]],
    [[0, 3], [1, 4], [5, 2]],
    [[2, 5], [1, 4], [0, 3]],
    [[2, 5], [3, 0], [1, 4]],
    [[4, 1], [3, 0], [2, 5]],
]


def uvw_face(f: int, axis: int, direction: int) -> int:
    return _FACE_UVW_FACES[f][axis][direction]


# -- small vector helpers -----------------------------------------------------


def _sub(a: Vec, b: Vec) -> Vec:
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _add(a: Vec, b: Vec) -> Vec:
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _dot(a: Vec, b: Vec) -> float:
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a: Vec, b: Vec) -> Vec:
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _mul(a: Vec, s: float) -> Vec:
    return (a[0] * s, a[1] * s, a[2] * s)


def _norm(a: Vec) -> float:
    return math.sqrt(_dot(a, a))


def _normalize(a: Vec) -> Vec:
    n = _norm(a)
    return a if n == 0 else _mul(a, 1.0 / n)


def _ortho(a: Vec) -> Vec:
    """ref r3/vector.rs ortho: unit vector orthogonal to a."""
    x, y, z = abs(a[0]), abs(a[1]), abs(a[2])
    if x < y:
        other = (1.0, 0.0, 0.0) if x < z else (0.0, 0.0, 1.0)
    else:
        other = (0.0, 1.0, 0.0) if y < z else (0.0, 0.0, 1.0)
    return _normalize(_cross(a, other))


def point_cross(a: Vec, b: Vec) -> Vec:
    """ref point.rs:144-156: (a+b)×(b−a) = 2(a×b), robust for a≈±b;
    exactly-zero result falls back to an arbitrary orthogonal vector."""
    v = _cross(_add(a, b), _sub(b, a))
    if v == (0.0, 0.0, 0.0):
        return _ortho(a)
    return v


# -- exact sum machinery (edge_clipping.rs:188-300) ---------------------------


def sum_equal(u: float, v: float, w: float) -> bool:
    """u + v == w exactly, using only float ops (edge_clipping.rs:211)."""
    return (u + v == w) and (u == w - v) and (v == w - u)


def intersects_face(n: Vec) -> bool:
    """Line with uvw-normal n intersects the [-1,1]² face: exactly
    |Nu| + |Nv| >= |Nw| (edge_clipping.rs:233-246)."""
    u, v, w = abs(n[0]), abs(n[1]), abs(n[2])
    return (v >= w - u) and (u >= w - v)


def intersects_opposite_edges(n: Vec) -> bool:
    """||Nu| − |Nv|| >= |Nw| exactly (edge_clipping.rs:252-273)."""
    u, v, w = abs(n[0]), abs(n[1]), abs(n[2])
    if abs(u - v) != w:
        return abs(u - v) >= w
    if u >= v:
        return u - w >= v
    return v - w >= u


def exit_axis(n: Vec) -> int:
    """Axis on which the line exits the face (edge_clipping.rs:280-303)."""
    if intersects_opposite_edges(n):
        return AXIS_V if abs(n[0]) >= abs(n[1]) else AXIS_U
    x = 1 if math.copysign(1.0, n[0]) < 0 else 0
    y = 1 if math.copysign(1.0, n[1]) < 0 else 0
    z = 1 if math.copysign(1.0, n[2]) < 0 else 0
    return AXIS_V if (x ^ y ^ z) == 0 else AXIS_U


def exit_point(n: Vec, axis: int) -> tuple[float, float]:
    """uv point where the line exits the face (edge_clipping.rs:308-327)."""
    if axis == AXIS_U:
        u = 1.0 if n[1] > 0.0 else -1.0
        return (u, (-u * n[0] - n[2]) / n[1])
    v = 1.0 if n[0] < 0.0 else -1.0
    return ((-v * n[1] - n[2]) / n[0], v)


def _clip_destination(
    a: Vec, b: Vec, scaled_n: Vec, a_tan: Vec, b_tan: Vec, scale_uv: float
) -> tuple[tuple[float, float], int]:
    """ref edge_clipping.rs:337-414."""
    max_save_uv_coord = 1.0 - FACE_CLIP_ERROR_UV_COORD
    if b[2] > 0.0:
        uv = (b[0] / b[2], b[1] / b[2])
        if max(abs(uv[0]), abs(uv[1])) < max_save_uv_coord:
            return uv, 0

    ep = exit_point(scaled_n, exit_axis(scaled_n))
    uv = (ep[0] * scale_uv, ep[1] * scale_uv)
    p: Vec = (uv[0], uv[1], 1.0)

    score = 0
    if _dot(_sub(p, a), a_tan) < 0.0:
        score = 2  # B' is on wrong side of A
    elif _dot(_sub(p, b), b_tan) < 0.0:
        score = 1  # B' is on wrong side of B

    if score > 0:
        if b[2] <= 0.0:
            score = 3  # B cannot be projected onto this face
        else:
            uv = (b[0] / b[2], b[1] / b[2])
    return uv, score


def clip_to_padded_face(
    a: Vec, b: Vec, f: int, padding: float
) -> tuple[tuple[float, float], tuple[float, float], bool]:
    """Clip edge AB to face f padded to [-R,R]² (R = 1+padding);
    ref edge_clipping.rs:86-156."""
    if face(a) == f and face(b) == f:
        return valid_face_xyz_to_uv(f, a), valid_face_xyz_to_uv(f, b), True

    # the cross product must be taken in (x,y,z) (see reference comment)
    norm_uvw = face_xyz_to_uvw(f, point_cross(a, b))
    a_uvw = face_xyz_to_uvw(f, a)
    b_uvw = face_xyz_to_uvw(f, b)

    scale_uv = 1.0 + padding
    scaled_n: Vec = (scale_uv * norm_uvw[0], scale_uv * norm_uvw[1], norm_uvw[2])
    if not intersects_face(scaled_n):
        return (0.0, 0.0), (0.0, 0.0), False

    # workaround for extremely small normals (underflow in normalize)
    if max(abs(norm_uvw[0]), abs(norm_uvw[1]), abs(norm_uvw[2])) < math.ldexp(
        1.0, -511
    ):
        norm_uvw = _mul(norm_uvw, math.ldexp(1.0, 563))
    norm_uvw = _normalize(norm_uvw)
    a_tan = _cross(norm_uvw, a_uvw)
    b_tan = _cross(norm_uvw, b_uvw)

    neg_n = _mul(scaled_n, -1.0)
    a_uv, a_score = _clip_destination(b_uvw, a_uvw, neg_n, b_tan, a_tan, scale_uv)
    b_uv, b_score = _clip_destination(a_uvw, b_uvw, neg_n, a_tan, b_tan, scale_uv)
    return a_uv, b_uv, a_score + b_score < 3


def clip_to_face(a: Vec, b: Vec, f: int):
    return clip_to_padded_face(a, b, f, 0.0)


# -- 2D rect clipping (edge_clipping.rs:417-577) ------------------------------


def _interpolate_f64(x: float, a: float, b: float, a1: float, b1: float) -> float:
    """Exact-endpoint interpolation (edge_clipping.rs:562-577)."""
    if a == b:
        return a1
    if abs(a - x) <= abs(b - x):
        return a1 + (b1 - a1) * (x - a) / (b - a)
    return b1 + (a1 - b1) * (x - b) / (a - b)


def _update_endpoint(lo, hi, high_endpoint: bool, value: float):
    """ref edge_clipping.rs:417-439; returns (lo, hi, ok)."""
    if not high_endpoint:
        if hi < value:
            return lo, hi, False
        if lo < value:
            lo = value
        return lo, hi, True
    if lo > value:
        return lo, hi, False
    if hi > value:
        hi = value
    return lo, hi, True


def _clip_bound_axis(a0, b0, lo0, hi0, a1, b1, lo1, hi1, neg_slope, clip_lo, clip_hi):
    """ref edge_clipping.rs:447-489; returns (lo0,hi0,lo1,hi1,ok)."""
    if lo0 < clip_lo:
        if hi0 < clip_lo:
            return lo0, hi0, lo1, hi1, False
        lo0 = clip_lo
        lo1, hi1, ok = _update_endpoint(
            lo1, hi1, neg_slope, _interpolate_f64(clip_lo, a0, b0, a1, b1)
        )
        if not ok:
            return lo0, hi0, lo1, hi1, False
    if hi0 > clip_hi:
        if lo0 > clip_hi:
            return lo0, hi0, lo1, hi1, False
        hi0 = clip_hi
        lo1, hi1, ok = _update_endpoint(
            lo1, hi1, not neg_slope, _interpolate_f64(clip_hi, a0, b0, a1, b1)
        )
        if not ok:
            return lo0, hi0, lo1, hi1, False
    return lo0, hi0, lo1, hi1, True


def clip_edge_bound(a, b, clip: R2Rect, bound: R2Rect) -> tuple[R2Rect, bool]:
    """Clip the bound of edge-portion A'B' to `clip`
    (ref edge_clipping.rs:530-556)."""
    neg_slope = (a[0] > b[0]) != (a[1] > b[1])
    x_lo, x_hi, y_lo, y_hi, ok = _clip_bound_axis(
        a[0], b[0], bound.x_lo, bound.x_hi,
        a[1], b[1], bound.y_lo, bound.y_hi,
        neg_slope, clip.x_lo, clip.x_hi,
    )
    if not ok:
        return bound, False
    y_lo, y_hi, x_lo, x_hi, ok = _clip_bound_axis(
        a[1], b[1], y_lo, y_hi,
        a[0], b[0], x_lo, x_hi,
        neg_slope, clip.y_lo, clip.y_hi,
    )
    return R2Rect(x_lo, x_hi, y_lo, y_hi), ok


def clipped_edge_bound(a, b, clip: R2Rect) -> R2Rect:
    bound = R2Rect.from_points([a, b])
    b1, intersects = clip_edge_bound(a, b, clip, bound)
    return b1 if intersects else EMPTY_R2RECT


def clip_edge(a, b, clip: R2Rect):
    """Portion of edge AB inside `clip` (ref edge_clipping.rs:162-186);
    returns (a_clip, b_clip, intersects)."""
    bound = R2Rect.from_points([a, b])
    bound, intersects = clip_edge_bound(a, b, clip, bound)
    if not intersects:
        return (0.0, 0.0), (0.0, 0.0), False
    ai = 1 if a[0] > b[0] else 0
    aj = 1 if a[1] > b[1] else 0
    return bound.vertex_ij(ai, aj), bound.vertex_ij(1 - ai, 1 - aj), True


def edge_intersects_rect(a, b, r: R2Rect) -> bool:
    """ref edge_clipping.rs:493-516."""
    if not r.intersects(R2Rect.from_points([a, b])):
        return False
    # ortho of (b-a) in 2D: (-dy, dx)
    nx, ny = -(b[1] - a[1]), b[0] - a[0]
    i = 1 if nx >= 0.0 else 0
    j = 1 if ny >= 0.0 else 0
    vi, vj = r.vertex_ij(i, j)
    wi, wj = r.vertex_ij(1 - i, 1 - j)
    mx = nx * (vi - a[0]) + ny * (vj - a[1])
    mn = nx * (wi - a[0]) + ny * (wj - a[1])
    return mx >= 0.0 and mn <= 0.0


# -- face segments (edge_clipping.rs:584-775) ---------------------------------


class FaceSegment(NamedTuple):
    face: int
    a: tuple[float, float]
    b: tuple[float, float]


def _move_origin_to_valid_face(f, a, ab, a_uv):
    """ref edge_clipping.rs:683-731."""
    max_save_uv_coord = 1.0 - FACE_CLIP_ERROR_UV_COORD
    if max(abs(a_uv[0]), abs(a_uv[1])) <= max_save_uv_coord:
        return f, a_uv
    n = face_xyz_to_uvw(f, ab)
    if intersects_face(n):
        uv = exit_point(n, exit_axis(n))
        exit_xyz = face_uv_to_xyz(f, uv[0], uv[1])
        a_tan = _cross(_normalize(ab), a)
        if _dot(_sub(exit_xyz, a), a_tan) >= -FACE_CLIP_ERROR_RADIANS:
            return f, a_uv
    if abs(a_uv[0]) >= abs(a_uv[1]):
        f = uvw_face(f, 0, 1 if a_uv[0] > 0.0 else 0)
    else:
        f = uvw_face(f, 1, 1 if a_uv[1] > 0.0 else 0)
    u, v = valid_face_xyz_to_uv(f, a)
    return f, (max(-1.0, min(1.0, u)), max(-1.0, min(1.0, v)))


def _next_face(f, exit_uv, axis, n, target_face):
    """ref edge_clipping.rs:738-775."""
    if axis == AXIS_V:
        exit_a, exit_1minus_a = exit_uv[1], exit_uv[0]
    else:
        exit_a, exit_1minus_a = exit_uv[0], exit_uv[1]
    exit_a_pos = 1 if exit_a > 0.0 else 0
    exit_1minus_a_pos = 1 if exit_1minus_a > 0.0 else 0
    if (
        abs(exit_1minus_a) == 1.0
        and uvw_face(f, 1 - axis, exit_1minus_a_pos) == target_face
        and sum_equal(exit_uv[0] * n[0], exit_uv[1] * n[1], -n[2])
    ):
        return target_face
    return uvw_face(f, axis, exit_a_pos)


def face_segments(a: Vec, b: Vec) -> list[FaceSegment]:
    """Subdivide edge AB at every cube-face crossing; continuous path
    from A to B, vertices within FACE_CLIP_ERROR_UV_DIST of line AB
    (ref edge_clipping.rs:602-680)."""
    a_face, a_x, a_y = xyz_to_face_uv(a)
    b_face, b_x, b_y = xyz_to_face_uv(b)
    if a_face == b_face:
        return [FaceSegment(a_face, (a_x, a_y), (b_x, b_y))]

    ab = point_cross(a, b)
    a_face, seg_a = _move_origin_to_valid_face(a_face, a, ab, (a_x, a_y))
    b_face, seg_b = _move_origin_to_valid_face(b_face, b, _mul(ab, -1.0), (b_x, b_y))

    segments: list[FaceSegment] = []
    b_saved = seg_b
    f = a_face
    cur_a = seg_a
    while f != b_face:
        n = face_xyz_to_uvw(f, ab)
        axis = exit_axis(n)
        cur_b = exit_point(n, axis)
        segments.append(FaceSegment(f, cur_a, cur_b))
        exit_xyz = face_uv_to_xyz(f, cur_b[0], cur_b[1])
        f = _next_face(f, cur_b, axis, n, b_face)
        exit_uvw = face_xyz_to_uvw(f, exit_xyz)
        cur_a = (exit_uvw[0], exit_uvw[1])
    segments.append(FaceSegment(f, cur_a, b_saved))
    return segments
