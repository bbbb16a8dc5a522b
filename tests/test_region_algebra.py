"""Region algebra additions: cell areas, cap union, rect algebra,
cellunion measures, advance, polyline proximity."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from rust_s2_spark.geometry import Cap, CellUnion, Rect
from rust_s2_spark.geometry import point as pt
from rust_s2_spark.kernels import cellid as k
from rust_s2_spark.kernels import metric as metrics


def test_cell_areas_telescoping():
    # children areas sum to the parent area (ref cell.rs:659-707)
    cid = k.parent(k.cell_from_latlng(np.array([12.3]), np.array([45.6])), 8)
    parent_area = k.cell_area_exact(cid)[0]
    child_sum = float(np.sum(k.cell_area_exact(k.children(cid)[0])))
    assert abs(parent_area - child_sum) < 1e-12 * parent_area + 1e-18
    # average area formula
    assert abs(k.cell_area_average(cid)[0] - metrics.AVG_AREA.value(8)) < 1e-18
    # all faces sum to the sphere
    faces = k.from_face(np.arange(6))
    total = float(np.sum(k.cell_area_exact(faces)))
    assert abs(total - 4 * math.pi) < 1e-9


def test_cellunion_areas_and_bounds():
    cid = int(k.parent(k.cell_from_latlng(np.array([40.0]), np.array([-74.0])), 6)[0])
    cu = CellUnion([cid])
    assert abs(cu.average_area() - metrics.AVG_AREA.value(6)) < 1e-18
    exact = cu.exact_area()
    assert 0.5 * cu.average_area() < exact < 2.0 * cu.average_area()
    # rect/cap bounds contain the cell center
    x, y, z = k.cell_to_xyz(np.array([cid], dtype=np.uint64))
    p = pt.normalize((float(x[0]), float(y[0]), float(z[0])))
    assert cu.rect_bound().contains_point(p)
    assert cu.cap_bound().contains_point(p)
    assert cu.contains_point_xyz(*p)


def test_cap_union_and_add():
    a = Cap.from_latlng_degrees(10, 10, 2.0)
    b = Cap.from_latlng_degrees(12, 10, 1.0)
    u = a.union(b)
    for cap in (a, b):
        # the union is boundary-tight; allow 1e-12 rad of float slop
        assert u.expanded(1e-12).contains_cap(cap)
    # disjoint caps: union covers both
    c = Cap.from_latlng_degrees(30, 30, 0.5)
    u2 = a.union(c).expanded(1e-12)
    assert u2.contains_cap(a) and u2.contains_cap(c)
    # add_cap grows in place
    g = a.add_cap(c).expanded(1e-12)
    assert g.contains_cap(c)


def test_rect_algebra():
    r1 = Rect.from_degrees(0, 0, 10, 20)
    r2 = Rect.from_degrees(5, 10, 15, 30)
    inter = r1.intersection(r2)
    assert inter.contains_latlng_rad(math.radians(7), math.radians(15))
    assert not inter.contains_latlng_rad(math.radians(2), math.radians(15))
    # area: whole sphere = 4π
    assert abs(Rect.full().area() - 4 * math.pi) < 1e-12
    # distance: zero inside, positive outside, roughly the gap size
    assert r1.distance_to_latlng_rad(math.radians(5), math.radians(10)) == 0
    d = r1.distance_to_latlng_rad(math.radians(12), math.radians(10))
    assert math.radians(1.5) < d < math.radians(3.0)


def test_advance_kernel():
    cid = k.parent(
        k.from_face_ij(np.array([2]), np.array([100]), np.array([200])), 10
    )
    fwd = k.advance(cid, np.array([5]))
    assert k.level(fwd)[0] == 10
    back = k.advance(fwd, np.array([-5]))
    assert back[0] == cid[0]
    # clamps at begin
    clamped = k.advance(cid, np.array([-(10**18)]))
    assert k.is_valid(clamped)[0]


def test_near_polyline(spark, sf_dir):
    from rust_s2_spark.operators.polyline import near_polyline, polyline_distance_expr
    from rust_s2_spark.sources import images_from_orders

    img = images_from_orders(spark, sf_dir, with_bytes=False).cache()
    # polyline through the NYC hotspot
    line = [(38.0, -76.0), (40.7, -74.0), (43.0, -72.0)]
    out = near_polyline(img, line, radius_deg=1.0)
    n = out.count()
    assert n > 0
    # brute force: distance expr without pruning
    verts = np.array([pt.latlng_to_xyz(a, b) for a, b in line])
    thresh = pt.angle_to_chord2(math.radians(1.0))
    brute = img.withColumn(
        "d", polyline_distance_expr(verts, "lat", "lng")
    ).where(F.col("d") <= thresh)
    assert brute.count() == n
    got = set(r.image_id for r in out.select("image_id").collect())
    want = set(r.image_id for r in brute.select("image_id").collect())
    assert got == want
