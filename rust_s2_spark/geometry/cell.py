"""Scalar S2 Cell for driver-side region logic (coverer, predicates).

Semantics per the public S2 Cell as exercised by the reference tests
(/root/reference/src/s2/cell.rs). Built on the vectorized kernels for
the id→(face,i,j) unfiddling, but all geometry here is scalar Python —
this type only runs on query regions / covering candidates, never on
data rows.
"""

from __future__ import annotations

import math
from functools import cached_property

import numpy as np

from ..kernels import cellid as k
from . import point as pt
from .intervals import PI, R1Interval, S1Interval

DBL_EPSILON = pt.DBL_EPSILON
POLE_MIN_LAT = math.asin(math.sqrt(1.0 / 3.0)) - 0.5 * DBL_EPSILON

# d(xyz)/du and d(xyz)/dv per face (public S2 face chart axes).
U_AXIS = [(0, 1, 0), (-1, 0, 0), (-1, 0, 0), (0, 0, -1), (0, 0, -1), (0, 1, 0)]
V_AXIS = [(0, 0, 1), (0, 0, 1), (0, -1, 0), (0, -1, 0), (1, 0, 0), (1, 0, 0)]


def _st_to_uv(s: float) -> float:
    if s >= 0.5:
        return (1.0 / 3.0) * (4.0 * s * s - 1.0)
    return (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))


def _face_uv_to_xyz(face: int, u: float, v: float) -> pt.Vec:
    if face == 0:
        return (1.0, u, v)
    if face == 1:
        return (-u, 1.0, v)
    if face == 2:
        return (-u, -v, 1.0)
    if face == 3:
        return (-1.0, -v, -u)
    if face == 4:
        return (v, -1.0, -u)
    return (v, u, -1.0)


def _face_xyz_to_uv(face: int, p: pt.Vec) -> tuple[float, float] | None:
    x, y, z = p
    if face == 0:
        if x <= 0:
            return None
        return (y / x, z / x)
    if face == 1:
        if y <= 0:
            return None
        return (-x / y, z / y)
    if face == 2:
        if z <= 0:
            return None
        return (-x / z, -y / z)
    if face == 3:
        if x >= 0:
            return None
        return (z / x, y / x)
    if face == 4:
        if y >= 0:
            return None
        return (z / y, -x / y)
    if z >= 0:
        return None
    return (-y / z, -x / z)


def _unorm(face: int, u: float) -> pt.Vec:
    return [
        (u, -1.0, 0.0),
        (1.0, u, 0.0),
        (1.0, 0.0, u),
        (-u, 0.0, 1.0),
        (0.0, -u, 1.0),
        (0.0, -1.0, -u),
    ][face]


def _vnorm(face: int, v: float) -> pt.Vec:
    return [
        (-v, 0.0, 1.0),
        (0.0, -v, 1.0),
        (0.0, -1.0, -v),
        (v, -1.0, 0.0),
        (1.0, v, 0.0),
        (1.0, 0.0, v),
    ][face]


class Cell:
    __slots__ = ("id", "face", "level", "orientation", "u_lo", "u_hi", "v_lo", "v_hi", "__dict__")

    def __init__(self, cell_id: int):
        # pure-int fast path: the coverer constructs tens of thousands of
        # Cells per deep covering; numpy per-call overhead here used to
        # dominate the whole coverer (~150µs/cell vs ~6µs now)
        cid = int(cell_id)
        self.id = cid
        f, i, j, o = k._to_face_ij_orientation_scalar(cid)
        low = cid & -cid
        lvl = 30 - ((low.bit_length() - 1) >> 1)
        self.face = int(f)
        self.level = lvl
        self.orientation = int(o)
        size = 1 << (30 - lvl)
        self._i = int(i)
        self._j = int(j)
        x_lo = int(i) & -size
        y_lo = int(j) & -size
        self.u_lo = _st_to_uv(x_lo / float(1 << 30))
        self.u_hi = _st_to_uv((x_lo + size) / float(1 << 30))
        self.v_lo = _st_to_uv(y_lo / float(1 << 30))
        self.v_hi = _st_to_uv((y_lo + size) / float(1 << 30))

    # -- geometry -----------------------------------------------------------

    def uv_vertex(self, i: int, j: int) -> tuple[float, float]:
        return (
            self.u_lo if i == 0 else self.u_hi,
            self.v_lo if j == 0 else self.v_hi,
        )

    @cached_property
    def vertices(self) -> list[pt.Vec]:
        """CCW vertices: (lo,lo) (hi,lo) (hi,hi) (lo,hi), unit length."""
        corners = [
            (self.u_lo, self.v_lo),
            (self.u_hi, self.v_lo),
            (self.u_hi, self.v_hi),
            (self.u_lo, self.v_hi),
        ]
        return [pt.normalize(_face_uv_to_xyz(self.face, u, v)) for u, v in corners]

    def edge(self, kk: int) -> pt.Vec:
        """Inward normal of edge k (ref cell.rs:139-147), unit length."""
        if kk == 0:
            return pt.normalize(_vnorm(self.face, self.v_lo))
        if kk == 1:
            return pt.normalize(_unorm(self.face, self.u_hi))
        if kk == 2:
            return pt.normalize(pt.scale(_vnorm(self.face, self.v_hi), -1.0))
        return pt.normalize(pt.scale(_unorm(self.face, self.u_lo), -1.0))

    @cached_property
    def center(self) -> pt.Vec:
        # scalar mirror of kernels.cellid.cell_to_xyz (face_siti delta rule,
        # cellid.rs:413-433) — same IEEE ops, no numpy per-call overhead
        cid = self.id
        if cid & 1:
            delta = 1
        elif (self._i ^ (cid >> 2)) & 1:
            delta = 2
        else:
            delta = 0
        max_siti = float(2 << 30)
        u = _st_to_uv((2 * self._i + delta) / max_siti)
        v = _st_to_uv((2 * self._j + delta) / max_siti)
        return pt.normalize(_face_uv_to_xyz(self.face, u, v))

    def contains_point(self, p: pt.Vec) -> bool:
        uv = _face_xyz_to_uv(self.face, p)
        if uv is None:
            return False
        u, v = uv
        # closed-cell semantics: expand by DBL_EPSILON (ref cell.rs:392-407)
        return (
            self.u_lo - DBL_EPSILON <= u <= self.u_hi + DBL_EPSILON
            and self.v_lo - DBL_EPSILON <= v <= self.v_hi + DBL_EPSILON
        )

    def contains_points_array(self, pts: np.ndarray) -> np.ndarray:
        """Vectorized contains_point over an (n,3) array — same face
        projection and closed-cell epsilon as the scalar path (one numpy
        pass instead of n Python calls; the Loop coverer predicates test
        every polygon vertex against every candidate cell)."""
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        f = self.face
        with np.errstate(divide="ignore", invalid="ignore"):
            if f == 0:
                valid, u, v = x > 0, y / x, z / x
            elif f == 1:
                valid, u, v = y > 0, -x / y, z / y
            elif f == 2:
                valid, u, v = z > 0, -x / z, -y / z
            elif f == 3:
                valid, u, v = x < 0, z / x, y / x
            elif f == 4:
                valid, u, v = y < 0, z / y, -x / y
            else:
                valid, u, v = z < 0, -y / z, -x / z
        return (
            valid
            & (u >= self.u_lo - DBL_EPSILON)
            & (u <= self.u_hi + DBL_EPSILON)
            & (v >= self.v_lo - DBL_EPSILON)
            & (v <= self.v_hi + DBL_EPSILON)
        )

    def _latitude(self, i: int, j: int) -> float:
        u, v = self.uv_vertex(i, j)
        x, y, z = _face_uv_to_xyz(self.face, u, v)
        return math.atan2(z, math.hypot(x, y))

    def _longitude(self, i: int, j: int) -> float:
        u, v = self.uv_vertex(i, j)
        x, y, _ = _face_uv_to_xyz(self.face, u, v)
        return math.atan2(y, x)

    def rect_bound(self):
        """Exact lat/lng bound (ref cell.rs:279-383)."""
        from .rect import Rect

        if self.level > 0:
            u = self.u_lo + self.u_hi
            v = self.v_lo + self.v_hi
            i = (1 if u < 0 else 0) if U_AXIS[self.face][2] == 0 else (1 if u > 0 else 0)
            j = (1 if v < 0 else 0) if V_AXIS[self.face][2] == 0 else (1 if v > 0 else 0)
            lat = R1Interval.from_point(self._latitude(i, j)).add_point(
                self._latitude(1 - i, 1 - j)
            )
            lng = S1Interval.empty().add_point(self._longitude(i, 1 - j)).add_point(
                self._longitude(1 - i, j)
            )
            max_err = 2.0 * DBL_EPSILON
            return Rect(lat, lng).expanded(max_err, max_err).polar_closure()

        pi_4 = PI / 4.0
        if self.face == 0:
            r = Rect(R1Interval(-pi_4, pi_4), S1Interval(-pi_4, pi_4))
        elif self.face == 1:
            r = Rect(R1Interval(-pi_4, pi_4), S1Interval(pi_4, 3 * pi_4))
        elif self.face == 2:
            r = Rect(R1Interval(POLE_MIN_LAT, PI / 2), S1Interval.full())
        elif self.face == 3:
            r = Rect(R1Interval(-pi_4, pi_4), S1Interval(3 * pi_4, -3 * pi_4))
        elif self.face == 4:
            r = Rect(R1Interval(-pi_4, pi_4), S1Interval(-3 * pi_4, -pi_4))
        else:
            r = Rect(R1Interval(-PI / 2, -POLE_MIN_LAT), S1Interval.full())
        return r.expanded(DBL_EPSILON, 0.0)

    def cap_bound(self):
        """Bounding cap from the uv-center plus 4 vertices (ref cell.rs:410-425)."""
        from .cap import Cap

        u = 0.5 * (self.u_lo + self.u_hi)
        v = 0.5 * (self.v_lo + self.v_hi)
        cap = Cap(pt.normalize(_face_uv_to_xyz(self.face, u, v)), 0.0)
        for vert in self.vertices:
            cap = cap.add_point(vert)
        return cap

    # -- region protocol on ids --------------------------------------------

    def cell_union_bound(self) -> list[int]:
        """Region-protocol default: bound of the bounding cap
        (ref region.rs:58-60)."""
        return self.cap_bound().cell_union_bound()

    def contains_cell(self, other: "Cell") -> bool:
        w = (self.id & -self.id) - 1
        return self.id - w <= other.id <= self.id + w

    def intersects_cell(self, other: "Cell") -> bool:
        wa = (self.id & -self.id) - 1
        wb = (other.id & -other.id) - 1
        return other.id - wb <= self.id + wa and other.id + wb >= self.id - wa

    def children_ids(self) -> list[int]:
        b = self.id & -self.id
        c0 = self.id - b + (b >> 2)
        half = b >> 1
        return [c0, c0 + half, c0 + 2 * half, c0 + 3 * half]
