"""Region/coverer tests mirroring the reference's property + golden tests
(region.rs:563-703, cellunion.rs:531-731, cap.rs, rect.rs)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from rust_s2_spark.geometry import Cap, Cell, CellUnion, Rect, RegionCoverer
from rust_s2_spark.geometry import point as _unused  # noqa: F401
from rust_s2_spark.geometry import cap as cap_mod
from rust_s2_spark.geometry import point as pt
from rust_s2_spark.kernels import cellid as k

U = np.uint64


# --- CellUnion normalization golden (ref cellunion.rs:531-555) -------------


def test_cellunion_normalize_pittsburg():
    A = 0x80855C0000000000  # Pittsburg
    B = 0x80855D0000000000  # child of A
    X = 0x8085634000000000
    x_children = [int(c) for c in k.children(np.array([X], dtype=np.uint64))[0]]
    D = 0x8085630000000000
    # input: A + duplicate B + X's four children (collapse to X) + D
    cu = CellUnion([A, B, B] + x_children + [D])
    got = set(int(i) for i in cu.ids)
    # B is contained in A; X's 4 children collapse to X; X is contained in D
    assert got == {A, D}


def test_cellunion_membership_nyc():
    # ref cellunion.rs:619-731 — NYC single-cell union membership probes
    nyc = 0x89C25C0000000000
    cu = CellUnion([nyc])
    arr = np.array([nyc], dtype=np.uint64)
    child = int(k.children(arr)[0][1])
    parent = int(k.parent(arr, int(k.level(arr)[0]) - 1)[0])
    assert cu.contains_id(nyc)
    assert cu.contains_id(child)
    assert not cu.contains_id(parent)
    assert cu.intersects_id(parent)
    sfo = 0x808FC00000000000
    assert not cu.contains_id(sfo)
    assert not cu.intersects_id(sfo)


def test_cellunion_denormalize():
    face = int(k.from_face(np.array([2]))[0])
    cu = CellUnion([face])
    out = cu.denormalize(2, 1)
    assert len(out) == 16
    assert all(k.level(out) == 2)
    assert all(k.parent(out, 0) == U(face))


def test_cellunion_intersection_union():
    A = 0x80855C0000000000
    D = 0x8085630000000000
    arr = np.array([A], dtype=np.uint64)
    childA = int(k.children(arr)[0][2])
    u = CellUnion([A]).union(CellUnion([D]))
    assert u.contains_id(childA) and u.contains_id(D)
    inter = CellUnion([A, D]).intersection(CellUnion([childA]))
    assert set(int(i) for i in inter.ids) == {childA}


# --- Cap predicates ---------------------------------------------------------


def test_cap_basics():
    c = Cap.from_latlng_degrees(47.3, 8.5, 1.0)
    assert c.contains_point(pt.latlng_to_xyz(47.3, 8.5))
    assert c.contains_point(pt.latlng_to_xyz(47.9, 8.5))
    assert not c.contains_point(pt.latlng_to_xyz(49.0, 8.5))
    assert c.contains_cap(Cap.from_latlng_degrees(47.3, 8.5, 0.5))
    assert not c.contains_cap(Cap.from_latlng_degrees(47.3, 8.5, 1.5))
    assert c.intersects_cap(Cap.from_latlng_degrees(48.5, 8.5, 0.5))
    assert not c.intersects_cap(Cap.from_latlng_degrees(50.0, 8.5, 0.5))


def test_cap_cell_predicates_consistent():
    # a cap centered on a cell's center with big radius contains the cell
    cell_id = int(k.parent(k.cell_from_latlng(np.array([47.3]), np.array([8.5])), 10)[0])
    cell = Cell(cell_id)
    big = Cap(cell.center, pt.angle_to_chord2(math.radians(5.0)))
    tiny = Cap(cell.center, pt.angle_to_chord2(math.radians(1e-7)))
    far = Cap.from_latlng_degrees(-10.0, 100.0, 1.0)
    assert big.contains_cell(cell)
    assert big.intersects_cell(cell)
    assert tiny.intersects_cell(cell)
    assert not tiny.contains_cell(cell)
    assert not far.intersects_cell(cell)
    assert not far.contains_cell(cell)


def test_cell_contains_point_closed():
    # ref cell.rs:824-841: CellFromPoint(p).contains(p) always true
    rng = np.random.default_rng(7)
    for _ in range(50):
        lat, lng = rng.uniform(-89, 89), rng.uniform(-180, 180)
        p = pt.latlng_to_xyz(lat, lng)
        cid = int(k.cell_from_latlng(np.array([lat]), np.array([lng]))[0])
        assert Cell(cid).contains_point(p)


# --- Rect -------------------------------------------------------------------


def test_rect_contains_and_wrap():
    r = Rect.from_degrees(-10, 170, 10, -170)  # crosses the date line
    assert r.lng.is_inverted()
    assert r.contains_latlng_rad(math.radians(0), math.radians(180))
    assert r.contains_latlng_rad(math.radians(0), math.radians(175))
    assert r.contains_latlng_rad(math.radians(0), math.radians(-175))
    assert not r.contains_latlng_rad(math.radians(0), math.radians(0))
    assert not r.contains_latlng_rad(math.radians(20), math.radians(180))


def test_rect_cell_predicates():
    r = Rect.from_degrees(40, 0, 50, 20)
    inside = Cell(int(k.parent(k.cell_from_latlng(np.array([45.0]), np.array([10.0])), 8)[0]))
    outside = Cell(int(k.parent(k.cell_from_latlng(np.array([-45.0]), np.array([10.0])), 8)[0]))
    assert r.intersects_cell(inside)
    assert r.contains_cell(inside)
    assert not r.intersects_cell(outside)
    big = Cell(int(k.from_face(np.array([2]))[0]))  # north polar face
    assert not r.contains_cell(big)


def test_cell_rect_bound_contains_vertices():
    rng = np.random.default_rng(11)
    for _ in range(30):
        lat, lng = rng.uniform(-89, 89), rng.uniform(-180, 180)
        lvl = int(rng.integers(0, 28))
        cid = int(k.parent(k.cell_from_latlng(np.array([lat]), np.array([lng])), lvl)[0])
        cell = Cell(cid)
        bound = cell.rect_bound()
        for v in cell.vertices:
            la, ln = pt.xyz_to_latlng_rad(v)
            assert bound.contains_latlng_rad(la, ln), (cid, lvl)


# --- RegionCoverer ----------------------------------------------------------


def _check_covering(region, covering: CellUnion, interior: bool):
    """Tightness walk per ref region.rs:584-656."""
    min_level_cells: dict[int, int] = {}
    for cid in covering.ids:
        lvl = int(k.level(np.array([cid], dtype=np.uint64))[0])
        min_level_cells[lvl] = min_level_cells.get(lvl, 0) + 1
    for cid in covering.ids:
        cell = Cell(int(cid))
        if interior:
            assert region.contains_cell(cell), hex(int(cid))
        else:
            assert region.intersects_cell(cell), hex(int(cid))


def test_coverer_single_cell_is_itself():
    # ref region.rs:563-580: covering a cell with max_cells=1 is that cell
    rng = np.random.default_rng(5)
    for _ in range(40):
        lat, lng = rng.uniform(-85, 85), rng.uniform(-180, 180)
        lvl = int(rng.integers(0, 30))
        cid = int(k.parent(k.cell_from_latlng(np.array([lat]), np.array([lng])), lvl)[0])
        rc = RegionCoverer(min_level=0, max_level=30, level_mod=1, max_cells=1)
        cov = rc.covering(Cell(cid))
        assert list(cov.ids) == [U(cid)], hex(cid)


def test_coverer_doc_example_properties():
    # ref region.rs:69-75 doc example shape: cap at (47.3, 8.5); we use a
    # 0.05 sr area so max_cells can actually bind (a 5.0 sr cap at
    # min_level=7 legitimately needs tens of thousands of cells — the doc
    # notes min_level takes priority over max_cells).
    c = Cap.from_center_area(pt.latlng_to_xyz(47.3, 8.5), 0.05)
    rc = RegionCoverer(min_level=0, max_level=30, level_mod=1, max_cells=5)
    cov = rc.covering(c)
    assert 1 <= len(cov) <= 6  # max_cells binds when min_level doesn't force more
    _check_covering(c, cov, interior=False)
    # determinism
    cov2 = rc.covering(c)
    assert np.array_equal(cov.ids, cov2.ids)
    # min_level takes priority over max_cells and forces uniform level-7 cells
    rc7 = RegionCoverer(min_level=7, max_level=30, level_mod=1, max_cells=5)
    cov7 = rc7.covering(c)
    assert len(cov7) > 5
    assert all(int(l) >= 7 for l in k.level(cov7.ids))


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_coverer_random_caps(seed):
    # ref region.rs:658-703 random-caps property test, fixed seeds
    rng = np.random.default_rng(seed)
    for _ in range(20):
        lat, lng = rng.uniform(-85, 85), rng.uniform(-180, 180)
        max_level = int(rng.integers(0, 31))
        min_level = int(rng.integers(0, max_level + 1))
        level_mod = int(rng.integers(1, 4))
        max_cells = int(rng.integers(1, 10))
        # keep the cap small relative to min_level so the forced
        # min_level expansion stays bounded (the reference sizes its
        # random caps relative to the level under test too)
        from rust_s2_spark.kernels import metric as metrics

        width = metrics.AVG_WIDTH.value(min_level)
        radius = min(10 ** rng.uniform(-4, 0.5), 1.5 * width)
        cap = Cap.from_center_angle(pt.latlng_to_xyz(lat, lng), radius)
        rc = RegionCoverer(
            min_level=min_level,
            max_level=max_level,
            level_mod=level_mod,
            max_cells=max_cells,
        )
        cov = rc.covering(cap)
        assert len(cov) >= 1
        for cid in cov.ids:
            lvl = int(k.level(np.array([cid], dtype=np.uint64))[0])
            assert min_level <= lvl <= max(min_level, max_level)
            assert (lvl - min_level) % level_mod == 0
        _check_covering(cap, cov, interior=False)
        # every point sampled from the cap is inside the covering
        for _ in range(10):
            # uniform in the cap via rejection on the bounding rect
            la = rng.uniform(
                max(-90, math.degrees(math.asin(cap.center[2])) - math.degrees(radius)),
                min(90, math.degrees(math.asin(cap.center[2])) + math.degrees(radius)),
            )
            lo = rng.uniform(-180, 180)
            p = pt.latlng_to_xyz(la, lo)
            if not cap.contains_point(p):
                continue
            leaf = k.cell_from_latlng(np.array([la]), np.array([lo]))
            assert cu_contains_leaf(cov, leaf), (seed, la, lo)


def cu_contains_leaf(cov: CellUnion, leaf) -> bool:
    return bool(cov.contains_ids(leaf)[0])


def test_interior_covering_contained():
    cap = Cap.from_center_angle(pt.latlng_to_xyz(20.0, 30.0), 0.1)
    rc = RegionCoverer(min_level=0, max_level=16, level_mod=1, max_cells=20)
    inner = rc.interior_covering(cap)
    _check_covering(cap, inner, interior=True)
    outer = rc.covering(cap)
    assert outer.contains_union(inner)


# -- Rect boundary_intersects + centroid (ported from rect.rs:1194-1275,
#    2373-2460) ---------------------------------------------------------------


def _bi_pt(lat, lng):
    import math as _m

    from rust_s2_spark.geometry import point as _pt

    return _pt.latlng_to_xyz(float(lat), float(lng))


def test_boundary_intersects_cases():
    from rust_s2_spark.geometry.rect import Rect

    empty = Rect.empty()
    assert not empty.boundary_intersects(_bi_pt(0, 0), _bi_pt(1, 1))
    full = Rect.full()
    assert not full.boundary_intersects(_bi_pt(0, 0), _bi_pt(1, 1))

    lune = Rect.from_degrees(-90, 100, 90, 120)
    assert not lune.boundary_intersects(_bi_pt(60, 60), _bi_pt(90, 60))
    assert not lune.boundary_intersects(_bi_pt(-60, 110), _bi_pt(60, 110))
    assert lune.boundary_intersects(_bi_pt(60, 95), _bi_pt(60, 110))
    assert lune.boundary_intersects(_bi_pt(60, 115), _bi_pt(80, 125))

    north = Rect.from_degrees(0, -180, 90, 180)
    assert not north.boundary_intersects(_bi_pt(60, -180), _bi_pt(90, -180))
    assert not north.boundary_intersects(_bi_pt(60, -170), _bi_pt(60, 170))
    assert north.boundary_intersects(_bi_pt(-10, -180), _bi_pt(10, -180))

    south = Rect.from_degrees(-90, -180, 0, 180)
    assert not south.boundary_intersects(_bi_pt(-90, -180), _bi_pt(-60, -180))
    assert not south.boundary_intersects(_bi_pt(-60, -170), _bi_pt(-60, 170))
    assert south.boundary_intersects(_bi_pt(-10, -180), _bi_pt(10, -180))

    wrap = Rect.from_degrees(20, 170, 40, -170)
    assert wrap.boundary_intersects(_bi_pt(25, 160), _bi_pt(25, 180))
    assert wrap.boundary_intersects(_bi_pt(25, -160), _bi_pt(25, -180))
    assert wrap.boundary_intersects(_bi_pt(15, 175), _bi_pt(30, 175))
    assert wrap.boundary_intersects(_bi_pt(45, 175), _bi_pt(30, 175))
    assert not wrap.boundary_intersects(_bi_pt(25, -20), _bi_pt(25, 0))
    assert not wrap.boundary_intersects(_bi_pt(25, 20), _bi_pt(25, 0))
    assert not wrap.boundary_intersects(_bi_pt(15, -5), _bi_pt(30, -5))
    assert not wrap.boundary_intersects(_bi_pt(45, -5), _bi_pt(30, -5))


def test_rect_centroid_properties():
    """ref rect.rs:2424-2460: z-component of full-lng rects; additivity
    under splitting (centroid is area-scaled, so it sums)."""
    import math

    import numpy as np

    from rust_s2_spark.geometry.intervals import PI, R1Interval, S1Interval
    from rust_s2_spark.geometry.rect import Rect

    rng = np.random.default_rng(31)
    # full longitude range: z = (sin(lat1)+sin(lat2))/2 * area
    for _ in range(50):
        lat1, lat2 = sorted(rng.uniform(-math.pi / 2, math.pi / 2, size=2))
        r = Rect(R1Interval(lat1, lat2), S1Interval.full())
        c = r.centroid()
        want = 0.5 * (math.sin(lat1) + math.sin(lat2)) * r.area()
        assert c[2] == pytest.approx(want, abs=1e-14)
    # additivity: split a rect in lat or lng, centroids sum
    for _ in range(50):
        lat1, lat2 = sorted(rng.uniform(-math.pi / 2, math.pi / 2, size=2))
        lng1 = float(rng.uniform(-math.pi, math.pi))
        width = float(rng.uniform(0.1, 3.0))
        lng2 = math.atan2(math.sin(lng1 + width), math.cos(lng1 + width))
        r = Rect(R1Interval(lat1, lat2), S1Interval.new(lng1, lng2))
        if rng.uniform() < 0.5:
            mid = float(rng.uniform(lat1, lat2))
            c0 = Rect(R1Interval(lat1, mid), r.lng).centroid()
            c1 = Rect(R1Interval(mid, lat2), r.lng).centroid()
        else:
            midw = float(rng.uniform(0, width))
            lngm = math.atan2(math.sin(lng1 + midw), math.cos(lng1 + midw))
            c0 = Rect(r.lat, S1Interval.new(lng1, lngm)).centroid()
            c1 = Rect(r.lat, S1Interval.new(lngm, lng2)).centroid()
        c = r.centroid()
        for kk in range(3):
            assert c[kk] == pytest.approx(c0[kk] + c1[kk], abs=1e-10), kk
