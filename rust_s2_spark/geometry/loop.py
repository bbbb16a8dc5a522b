"""Spherical polygon loop region (point-in-polygon support).

The reference only ships the abstract Shape trait (shape.rs:151-233,
no implementations); this Loop is built from the reference's own
primitives: crossing tests (edgeutil.rs:96-113 simple_crossing),
orientation predicates (predicates.rs), and the RectBounder idea
(rect_bounder.rs) for lat/lng bounds.

Conventions
-----------
* vertices CCW, implicitly closed, interior on the left;
* the loop (boundary + interior) must fit in an open hemisphere —
  then the antipode of the vertex centroid is a guaranteed-exterior
  anchor and containment = crossing parity of the geodesic
  anchor→point with the boundary.
"""

from __future__ import annotations

import numpy as np

from ..kernels import cellid as k
from ..kernels import edges as ek
from . import point as pt
from .intervals import PI, R1Interval, S1Interval
from .rect import Rect


class Loop:
    def __init__(self, vertices: np.ndarray):
        """vertices: (n,3) unit vectors, CCW, n >= 3."""
        v = np.asarray(vertices, dtype=np.float64)
        if v.ndim != 2 or v.shape[0] < 3 or v.shape[1] != 3:
            raise ValueError("Loop needs (n>=3, 3) vertices")
        self.vertices = v / np.linalg.norm(v, axis=1, keepdims=True)
        centroid = self.vertices.sum(axis=0)
        nc = np.linalg.norm(centroid)
        if nc < 1e-9:
            raise ValueError("Loop vertices span a hemisphere or more")
        self.anchor = -centroid / nc  # guaranteed outside (hemisphere rule)

    @staticmethod
    def from_latlng_degrees(coords: list[tuple[float, float]]) -> "Loop":
        return Loop(np.array([pt.latlng_to_xyz(la, lo) for la, lo in coords]))

    # -- containment ---------------------------------------------------------

    def contains_points(self, x, y, z) -> np.ndarray:
        """Vectorized PIP: crossing parity of geodesic anchor→p with
        every boundary edge — ONE batched crossing call over the full
        (edges × points) grid. Pure numpy; this is the kernel the
        Spark pandas UDF calls."""
        p = np.stack(
            [
                np.asarray(x, dtype=np.float64),
                np.asarray(y, dtype=np.float64),
                np.asarray(z, dtype=np.float64),
            ],
            axis=1,
        )
        n = p.shape[0]
        verts = self.vertices
        m = verts.shape[0]
        a = np.repeat(verts, n, axis=0)  # (m*n, 3)
        b = np.repeat(np.roll(verts, -1, axis=0), n, axis=0)
        pp = np.tile(p, (m, 1))
        q = np.broadcast_to(self.anchor, (m * n, 3))
        crossings = np.asarray(ek.simple_crossing(q, pp, a, b)).reshape(m, n)
        return crossings.sum(axis=0) % 2 == 1

    def contains_point(self, p) -> bool:
        p = np.asarray(p, dtype=np.float64)
        return bool(self.contains_points(p[0:1], p[1:2], p[2:3])[0])

    # -- bounds --------------------------------------------------------------

    def rect_bound(self) -> Rect:
        """Conservative lat/lng bound via the reference-exact streaming
        RectBounder (geometry/rect_bounder.py, bit-exact against
        reference-dumped chains; was an inline edge-lat-extremes rule
        in round 1), with the Loop's pole closure on top
        (ref loop semantics: a loop containing a pole spans all
        longitudes)."""
        from .rect_bounder import RectBounder

        rb = RectBounder()
        m = self.vertices.shape[0]
        for i in range(m + 1):
            v = self.vertices[i % m]
            rb.add_point((float(v[0]), float(v[1]), float(v[2])))
        out = rb.get_bound()
        # if the loop contains a pole, the lng span must be full
        if self.contains_point((0.0, 0.0, 1.0)):
            out = Rect(R1Interval(out.lat.lo, PI / 2), S1Interval.full())
        if self.contains_point((0.0, 0.0, -1.0)):
            out = Rect(R1Interval(-PI / 2, out.lat.hi), S1Interval.full())
        return out

    def cap_bound(self):
        return self.rect_bound().cap_bound()

    def cell_union_bound(self) -> list[int]:
        return self.cap_bound().cell_union_bound()

    # -- region protocol for the coverer --------------------------------------

    def _cell_relation(self, cell):
        # the coverer asks intersects_cell then contains_cell for the
        # same candidate — memoize per cell id (a 10k-vertex loop pays
        # O(m) per relation; recomputing doubles the coverer cost)
        cache = getattr(self, "_rel_cache", None)
        if cache is None:
            cache = {}
            self._rel_cache = cache
        hit = cache.get(cell.id)
        if hit is not None:
            return hit
        verts = self.vertices
        m = verts.shape[0]
        cell_verts = np.array(cell.vertices)
        inside = self.contains_points(
            cell_verts[:, 0], cell_verts[:, 1], cell_verts[:, 2]
        )
        # any loop vertex inside the cell? (vectorized over all m verts)
        any_loop_vertex_in_cell = bool(cell.contains_points_array(verts).any())
        # boundary crossings between loop edges and cell edges. Cheap
        # conservative prefilter first: an edge can only cross the cell
        # if its min chord² distance to the cell's bounding-cap center is
        # within the cap radius (the crossing point would lie in the
        # cell ⊆ cap) — drops the robust crossing_sign call from all m
        # edges to the few near the cell (10k-vertex coverings: ~4×).
        va, vb = verts, np.roll(verts, -1, axis=0)
        cap = cell.cap_bound()
        center = np.broadcast_to(np.asarray(cap.center, dtype=np.float64), (m, 3))
        d2 = ek.dist2_point_segment(center, va, vb)
        near = d2 <= cap.radius2 * (1.0 + 1e-9) + 1e-12
        if near.any():
            na, nb = va[near], vb[near]
            mn = na.shape[0]
            a = np.repeat(na, 4, axis=0)
            b = np.repeat(nb, 4, axis=0)
            c = np.tile(cell_verts, (mn, 1))
            d = np.tile(np.roll(cell_verts, -1, axis=0), (mn, 1))
            crossing = bool(np.any(ek.crossing_sign(a, b, c, d) >= 0))
        else:
            crossing = False
        out = (inside, any_loop_vertex_in_cell, crossing)
        cache[cell.id] = out
        return out

    def intersects_cell(self, cell) -> bool:
        inside, loop_v_in_cell, crossing = self._cell_relation(cell)
        return bool(np.any(inside)) or loop_v_in_cell or crossing

    def contains_cell(self, cell) -> bool:
        inside, loop_v_in_cell, crossing = self._cell_relation(cell)
        return bool(np.all(inside)) and not loop_v_in_cell and not crossing

    # -- measures --------------------------------------------------------------

    def area(self) -> float:
        """Signed spherical area via triangulation from vertex 0
        (Σ point_area with orientation from robust_sign)."""
        v = self.vertices
        total = 0.0
        for i in range(1, len(v) - 1):
            tri_area = float(ek.point_area(v[0], v[i], v[i + 1])[0])
            sign = int(ek.robust_sign(v[0][None], v[i][None], v[i + 1][None])[0])
            total += sign * tri_area
        return abs(total)
