"""Point as a coverable Region (ref /root/reference/src/s2/point.rs:419-440):
cap_bound is the degenerate cap at the point, contains_cell is always
false, intersects_cell delegates to the cell's closed containment test."""

from __future__ import annotations

import math

from . import point as pt
from .cap import Cap
from .cell import Cell
from .intervals import R1Interval, S1Interval
from .rect import Rect


class PointRegion:
    def __init__(self, p: pt.Vec):
        n = math.sqrt(pt.dot(p, p))
        self.p = (p[0] / n, p[1] / n, p[2] / n)

    @staticmethod
    def from_latlng_degrees(lat: float, lng: float) -> "PointRegion":
        return PointRegion(pt.latlng_to_xyz(lat, lng))

    def cap_bound(self) -> Cap:
        return Cap(self.p, 0.0)

    def rect_bound(self) -> Rect:
        lat = math.atan2(self.p[2], math.hypot(self.p[0], self.p[1]))
        lng = math.atan2(self.p[1], self.p[0])
        return Rect(R1Interval(lat, lat), S1Interval.new(lng, lng))

    def contains_cell(self, cell: Cell) -> bool:
        return False

    def intersects_cell(self, cell: Cell) -> bool:
        return cell.contains_point(self.p)

    def cell_union_bound(self) -> list[int]:
        return self.cap_bound().cell_union_bound()
