"""Polygon: one shell loop plus zero or more hole loops.

The reference crate ships only the abstract ``Shape`` trait
(ref /root/reference/src/s2/shape.rs:151-233, no implementations), so
the polygon semantics here follow the public S2 Polygon contract it
describes: a point is inside iff it is inside an odd number of loops
(crossing parity XOR), which for a shell-with-holes nesting means
"inside the shell and outside every hole".

Region protocol (for RegionCoverer / covering joins) is conservative:
* contains_cell: the shell fully contains the cell AND no hole
  intersects it — sufficient for correctness of interior coverings.
* intersects_cell: the shell intersects the cell AND no hole fully
  contains it — any cell this rejects is provably disjoint from the
  polygon, so exterior coverings stay supersets.
"""

from __future__ import annotations

import numpy as np

from .loop import Loop


class Polygon:
    def __init__(self, shell: Loop, holes: list[Loop] | None = None):
        self.shell = shell
        self.holes = list(holes or [])

    @property
    def loops(self) -> list[Loop]:
        return [self.shell, *self.holes]

    @staticmethod
    def from_latlng_degrees(
        shell: list[tuple[float, float]],
        holes: list[list[tuple[float, float]]] | None = None,
    ) -> "Polygon":
        return Polygon(
            Loop.from_latlng_degrees(shell),
            [Loop.from_latlng_degrees(h) for h in (holes or [])],
        )

    # -- containment ----------------------------------------------------------

    def contains_points(self, x, y, z) -> np.ndarray:
        """Vectorized PIP: XOR of per-loop crossing parity."""
        inside = self.shell.contains_points(x, y, z)
        for h in self.holes:
            inside = inside ^ h.contains_points(x, y, z)
        return inside

    def contains_point(self, p) -> bool:
        p = np.asarray(p, dtype=np.float64)
        return bool(self.contains_points(p[0:1], p[1:2], p[2:3])[0])

    # -- region protocol -------------------------------------------------------

    def rect_bound(self):
        return self.shell.rect_bound()

    def cap_bound(self):
        return self.shell.cap_bound()

    def cell_union_bound(self) -> list[int]:
        return self.shell.cell_union_bound()

    def contains_cell(self, cell) -> bool:
        if not self.shell.contains_cell(cell):
            return False
        return not any(h.intersects_cell(cell) for h in self.holes)

    def intersects_cell(self, cell) -> bool:
        if not self.shell.intersects_cell(cell):
            return False
        return not any(h.contains_cell(cell) for h in self.holes)

    def area(self) -> float:
        return self.shell.area() - sum(h.area() for h in self.holes)
