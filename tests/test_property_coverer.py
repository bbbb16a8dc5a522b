"""Hypothesis property tests over RegionCoverer — the semantic
guarantees the reference's covering tests assert by construction
(region.rs RegionCoverer suite): a covering CONTAINS every point of
the region, an interior covering's cells are each CONTAINED in the
region, and the default parameters respect max_cells. These run next
to the 699 reference-dumped golden coverings (cell-for-cell equality);
the properties catch the semantic regressions goldens can't reach
(arbitrary caps, not the dumped parameter grid)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from rust_s2_spark.geometry import point as pt
from rust_s2_spark.geometry.cap import Cap
from rust_s2_spark.geometry.cell import Cell
from rust_s2_spark.geometry.coverer import RegionCoverer

lat_deg = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
lng_deg = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
radius = st.floats(min_value=0.01, max_value=30.0, allow_nan=False)


def _sample_points(lat: float, lng: float, radius_deg: float, n: int = 12):
    """Deterministic points inside the cap: the center plus rings at
    fractions of the radius in n compass directions (tangent-plane
    offsets, renormalized — stays strictly inside for radius <= 30
    degrees since the chord shrinks relative to the arc)."""
    c = pt.latlng_to_xyz(lat, lng)
    # tangent basis at c
    ref = (0.0, 0.0, 1.0) if abs(c[2]) < 0.9 else (1.0, 0.0, 0.0)
    u = pt.normalize(pt.cross(ref, c))
    v = pt.cross(c, u)
    out = [c]
    r = math.radians(radius_deg)
    for i in range(n):
        theta = 2.0 * math.pi * i / n
        frac = 0.35 + 0.6 * (i % 3) / 3.0  # 0.35, 0.683, 0.35, ...
        d = r * frac
        p = pt.add(
            pt.scale(c, math.cos(d)),
            pt.scale(
                pt.add(pt.scale(u, math.cos(theta)), pt.scale(v, math.sin(theta))),
                math.sin(d),
            ),
        )
        out.append(pt.normalize(p))
    return out


@settings(max_examples=60, deadline=None)
@given(lat=lat_deg, lng=lng_deg, r=radius)
def test_covering_contains_region_points(lat, lng, r):
    cap = Cap.from_latlng_degrees(lat, lng, r)
    cov = RegionCoverer(max_cells=8).covering(cap)
    assert len(cov.ids) <= 8
    for p in _sample_points(lat, lng, r):
        if cap.contains_point(p):
            assert cov.contains_point_xyz(*p), (lat, lng, r, p)


@settings(max_examples=60, deadline=None)
@given(lat=lat_deg, lng=lng_deg, r=radius)
def test_fast_covering_contains_region_points(lat, lng, r):
    cap = Cap.from_latlng_degrees(lat, lng, r)
    cov = RegionCoverer(max_cells=8).fast_covering(cap)
    for p in _sample_points(lat, lng, r):
        if cap.contains_point(p):
            assert cov.contains_point_xyz(*p), (lat, lng, r, p)


@settings(max_examples=60, deadline=None)
@given(lat=lat_deg, lng=lng_deg, r=radius)
def test_interior_covering_cells_inside_region(lat, lng, r):
    cap = Cap.from_latlng_degrees(lat, lng, r)
    cov = RegionCoverer(max_cells=8).interior_covering(cap)
    for cid in cov.ids:
        assert cap.contains_cell(Cell(int(cid))), (lat, lng, r, int(cid))


@settings(max_examples=60, deadline=None)
@given(lat=lat_deg, lng=lng_deg, r=radius)
def test_interior_subset_of_covering(lat, lng, r):
    """Every interior cell is contained in the (outer) covering — the
    two traversals disagree only on boundary handling."""
    cap = Cap.from_latlng_degrees(lat, lng, r)
    rc = RegionCoverer(max_cells=8)
    outer = rc.covering(cap)
    for cid in rc.interior_covering(cap).ids:
        assert outer.contains_id(int(cid)), (lat, lng, r, int(cid))
