"""Spherical cap region (ref /root/reference/src/s2/cap.rs semantics).

A cap is (center unit vector, radius as squared chord length). Used as
a broadcast query-region parameter; all per-row work happens in
vectorized kernels / SQL, this class only drives the coverer and
query planning.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..kernels import cellid as k
from ..kernels import metric as metrics
from . import point as pt
from .intervals import PI, R1Interval, S1Interval


@dataclass(frozen=True)
class Cap:
    center: pt.Vec
    radius2: float  # squared chord length in [-1, 4]

    # -- constructors --------------------------------------------------------

    @staticmethod
    def from_latlng_degrees(lat: float, lng: float, radius_deg: float) -> "Cap":
        return Cap(
            pt.latlng_to_xyz(lat, lng),
            pt.angle_to_chord2(math.radians(radius_deg)),
        )

    @staticmethod
    def from_center_angle(center: pt.Vec, rad: float) -> "Cap":
        return Cap(center, pt.angle_to_chord2(rad))

    @staticmethod
    def from_center_chordangle(center: pt.Vec, radius2: float) -> "Cap":
        """Radius given as squared chord length (ref cap.rs:108-111) —
        the preferred constructor: exact and trig-free."""
        return Cap(center, radius2)

    @staticmethod
    def from_center_height(center: pt.Vec, height: float) -> "Cap":
        return Cap(center, 2.0 * height)

    @staticmethod
    def from_center_area(center: pt.Vec, area: float) -> "Cap":
        return Cap(center, area / PI)

    @staticmethod
    def empty() -> "Cap":
        return Cap((1.0, 0.0, 0.0), pt.NEGATIVE_CHORD2)

    @staticmethod
    def full() -> "Cap":
        return Cap((1.0, 0.0, 0.0), pt.STRAIGHT_CHORD2)

    # -- basic properties ----------------------------------------------------

    def is_empty(self) -> bool:
        return self.radius2 < 0.0

    def is_full(self) -> bool:
        return self.radius2 == pt.STRAIGHT_CHORD2

    def height(self) -> float:
        return 0.5 * self.radius2

    def radius_rad(self) -> float:
        return pt.chord2_to_angle(self.radius2)

    def area(self) -> float:
        return 2.0 * PI * max(0.0, self.height())

    # -- point / cap predicates ----------------------------------------------

    def contains_point(self, p: pt.Vec) -> bool:
        return pt.chord2(self.center, p) <= self.radius2

    def interior_contains_point(self, p: pt.Vec) -> bool:
        return self.is_full() or pt.chord2(self.center, p) < self.radius2

    def contains_cap(self, other: "Cap") -> bool:
        if self.is_full() or other.is_empty():
            return True
        return self.radius2 >= pt.chord2_add(
            pt.chord2(self.center, other.center), other.radius2
        )

    def intersects_cap(self, other: "Cap") -> bool:
        if self.is_empty() or other.is_empty():
            return False
        return pt.chord2_add(self.radius2, other.radius2) >= pt.chord2(
            self.center, other.center
        )

    def interior_intersects(self, other: "Cap") -> bool:
        """Interior of this cap intersects the other (ref cap.rs:201-209):
        requires a real interior here and a non-empty other."""
        if self.radius2 <= 0.0 or other.is_empty():
            return False
        return pt.chord2_add(self.radius2, other.radius2) > pt.chord2(
            self.center, other.center
        )

    def complement(self) -> "Cap":
        if self.is_full():
            return Cap.empty()
        if self.is_empty():
            return Cap.full()
        return Cap(
            pt.scale(self.center, -1.0),
            pt.chord2_sub(pt.STRAIGHT_CHORD2, self.radius2),
        )

    def expanded(self, rad: float) -> "Cap":
        if self.is_empty():
            return self
        return Cap(self.center, pt.chord2_add(self.radius2, pt.angle_to_chord2(rad)))

    def add_point(self, p: pt.Vec) -> "Cap":
        if self.is_empty():
            return Cap(p, 0.0)
        return Cap(self.center, max(self.radius2, pt.chord2(self.center, p)))

    def add_cap(self, other: "Cap") -> "Cap":
        """Grow to include the other cap (ref cap.rs:505-521)."""
        if self.is_empty():
            return other
        if other.is_empty():
            return self
        dist = pt.chord2_add(pt.chord2(self.center, other.center), other.radius2)
        dist = pt.chord2_add(dist, pt.DBL_EPSILON * dist)
        return Cap(self.center, max(self.radius2, dist))

    def union(self, other: "Cap") -> "Cap":
        """Smallest cap enclosing both (ref cap.rs:444-471)."""
        import math as _m

        from ..kernels import edges as ek

        a, b = (self, other) if self.radius2 > other.radius2 else (other, self)
        if a.is_full() or b.is_empty():
            return a
        a_r = a.radius_rad()
        b_r = b.radius_rad()
        d = pt.chord2_to_angle(pt.chord2(a.center, b.center))
        if a_r >= d + b_r:
            return a
        res_radius = 0.5 * (d + a_r + b_r)
        center = ek.interpolate_at_distance(
            0.5 * (d - a_r + b_r), np.array(a.center), np.array(b.center)
        )[0]
        return Cap(tuple(center), pt.angle_to_chord2(res_radius))

    def centroid(self) -> pt.Vec:
        """True centroid × area (ref cap.rs:423-441)."""
        if self.is_empty():
            return (0.0, 0.0, 0.0)
        r = 1.0 - 0.5 * self.height()
        return pt.scale(self.center, r * self.area())

    # -- region protocol (ref cap.rs:259-409) ---------------------------------

    def cap_bound(self) -> "Cap":
        return self

    def rect_bound(self):
        from .rect import Rect

        if self.is_empty():
            return Rect.empty()
        cap_angle = self.radius_rad()
        center_lat, center_lng = pt.xyz_to_latlng_rad(self.center)
        lat = R1Interval(center_lat - cap_angle, center_lat + cap_angle)
        lng = S1Interval.full()
        all_longitudes = False
        lat_lo, lat_hi = lat.lo, lat.hi
        if lat_lo < -PI / 2:
            lat_lo = -PI / 2
            all_longitudes = True
        if lat_hi > PI / 2:
            lat_hi = PI / 2
            all_longitudes = True
        if not all_longitudes:
            # sin of the cap angle via chord math (Go: ChordAngle.Sin();
            # the Rust port's `radius.0.sin()` is a non-conservative slip
            # we deliberately do NOT reproduce)
            sin_a = math.sqrt(pt.chord2_sin2(self.radius2))
            sin_c = math.cos(center_lat)
            if sin_a <= sin_c:
                angle_a = math.asin(sin_a / sin_c)
                lng = S1Interval(
                    pt.remainder(center_lng - angle_a, 2 * PI),
                    pt.remainder(center_lng + angle_a, 2 * PI),
                )
        return Rect(R1Interval(lat_lo, lat_hi), lng)

    def contains_cell(self, cell) -> bool:
        vertices = cell.vertices
        for v in vertices:
            if not self.contains_point(v):
                return False
        return not self.complement()._intersects_cell_vertices(cell, vertices)

    def intersects_cell(self, cell) -> bool:
        vertices = cell.vertices
        for v in vertices:
            if self.contains_point(v):
                return True
        return self._intersects_cell_vertices(cell, vertices)

    def _intersects_cell_vertices(self, cell, vertices) -> bool:
        """Intersection with cell interior/edges, vertices pre-checked
        (ref cap.rs:360-409)."""
        if self.radius2 >= pt.RIGHT_CHORD2:
            return False
        if self.is_empty():
            return False
        if cell.contains_point(self.center):
            return True
        sin2_angle = pt.chord2_sin2(self.radius2)
        for kk in range(4):
            edge = cell.edge(kk)
            d = pt.dot(self.center, edge)
            if d > 0:
                continue
            if d * d > sin2_angle * pt.norm2(edge):
                return False
            direction = pt.cross(edge, self.center)
            if (
                pt.dot(direction, vertices[kk]) < 0
                and pt.dot(direction, vertices[(kk + 1) & 3]) > 0
            ):
                return True
        return False

    def cell_union_bound(self) -> list[int]:
        """≤4-cell (or 6-face) covering seed (ref cap.rs:341-356)."""
        level = metrics.MIN_WIDTH.max_level(self.radius_rad())
        if level == 0:
            return [int(f) for f in k.from_face(np.arange(6))]
        center_id = k.cell_from_xyz(
            np.array([self.center[0]]),
            np.array([self.center[1]]),
            np.array([self.center[2]]),
        )
        return [int(c) for c in k.vertex_neighbors(center_id, level - 1)[0]]
