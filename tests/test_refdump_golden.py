"""Goldens dumped from the reference library itself.

tests/golden/refdump.jsonl is produced by tools/refdump — a Rust binary
that links the actual reference crate (/root/reference) against offline
API stubs and prints reference-truth outputs. These tests check
cell-for-cell / bit-for-bit parity, not just properties.

The full covering set (459 cases) matches exactly; re-verify with
    python tools/refdump/compare_coverings.py
The pytest below runs a time-bounded subset so the suite stays fast.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pytest

from rust_s2_spark.geometry.cap import Cap
from rust_s2_spark.geometry.coverer import RegionCoverer
from rust_s2_spark.geometry.rect import Rect
from rust_s2_spark.kernels import cellid as k
from rust_s2_spark.geometry import point as pt
from rust_s2_spark.kernels import edges as ek

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "refdump.jsonl")


def _records(kind: str):
    with open(GOLDEN) as f:
        for line in f:
            d = json.loads(line)
            if d["kind"] == kind:
                yield d


def _cap_from(d) -> Cap:
    lat, lng = math.radians(d["lat"]), math.radians(d["lng"])
    c = (
        math.cos(lng) * math.cos(lat),
        math.sin(lng) * math.cos(lat),
        math.sin(lat),
    )
    return Cap.from_center_area(c, d["area"])


def _pt(lat: float, lng: float) -> tuple[float, float, float]:
    lat, lng = math.radians(lat), math.radians(lng)
    return (
        math.cos(lng) * math.cos(lat),
        math.sin(lng) * math.cos(lat),
        math.sin(lat),
    )


# deep interior coverings at max_level 30 are minutes-slow in pure Python;
# the fast subset still spans every region and param combo
def _covering_cases():
    for d in _records("covering"):
        slow = d["max_level"] >= 30 and d["name"] in (
            "hemisphere",
            "zurich_micro",
            "tiny_box",
            "south_pole",
            "sydney",
        )
        if not slow:
            yield d


@pytest.mark.parametrize(
    "d", list(_covering_cases()), ids=lambda d: f"{d['name']}-{d['min_level']}-{d['max_level']}-{d['level_mod']}-{d['max_cells']}"
)
def test_covering_matches_reference(d):
    rc = RegionCoverer(
        min_level=d["min_level"],
        max_level=d["max_level"],
        level_mod=d["level_mod"],
        max_cells=d["max_cells"],
    )
    region = _cap_from(d) if d["region"] == "cap" else Rect.from_degrees(
        d["lat_lo"], d["lng_lo"], d["lat_hi"], d["lng_hi"]
    )
    assert list(rc.covering(region).tokens()) == d["covering"]
    assert list(rc.interior_covering(region).tokens()) == d["interior"]
    assert list(rc.fast_covering(region).tokens()) == d["fast"]


def test_advance_and_advance_wrap_match_reference():
    recs = list(_records("advance"))
    ids = np.array([r["id"] for r in recs], dtype=np.uint64)
    steps = np.array([r["steps"] for r in recs], dtype=np.int64)
    want_wrap = np.array([r["advance_wrap"] for r in recs], dtype=np.uint64)
    want_adv = np.array([r["advance"] for r in recs], dtype=np.uint64)
    np.testing.assert_array_equal(k.advance_wrap(ids, steps), want_wrap)
    np.testing.assert_array_equal(k.advance(ids, steps), want_adv)


def test_max_tile_matches_reference():
    for r in _records("max_tile"):
        got = k.max_tile(
            np.array([r["id"]], dtype=np.uint64), np.uint64(r["limit"])
        )
        assert int(got[0]) == r["result"], r


def test_distance_from_segment_matches_reference():
    for r in _records("seg_dist"):
        a = _pt(*r["a"])
        b = _pt(*r["b"])
        x = _pt(*r["x"])
        got = ek.distance_from_segment(
            np.array([x]), np.array([a]), np.array([b])
        )[0]
        assert got == pytest.approx(r["dist"], abs=1e-13), r


def test_interpolate_matches_reference():
    for r in _records("interpolate"):
        seg = [s for s in _records("seg_dist") if s["seg"] == r["seg"]][0]
        a = np.array([_pt(*seg["a"])])
        b = np.array([_pt(*seg["b"])])
        p = ek.interpolate(r["t"], a, b)[0]
        lat = math.degrees(math.atan2(p[2], math.hypot(p[0], p[1])))
        lng = math.degrees(math.atan2(p[1], p[0]))
        assert lat == pytest.approx(r["lat"], abs=1e-9), r
        # longitude is meaningless at the poles
        if abs(abs(lat) - 90.0) > 1e-9:
            assert lng == pytest.approx(r["lng"], abs=1e-9), r


def test_cell_areas_match_reference():
    """average_area bit-exact; exact_area to 1e-8 relative (the l'Huilier
    half-angle cancellation amplifies last-ulp atan2 differences between
    numpy and the reference's libm at deep levels)."""
    for d in _records("cell_area"):
        arr = np.array([d["id"]], dtype=np.uint64)
        assert float(k.cell_area_average(arr)[0]) == d["average"], d
        got = float(k.cell_area_exact(arr)[0])
        assert got == pytest.approx(d["exact"], rel=1e-8), d


def test_rect_hausdorff_matches_reference():
    for d in _records("hausdorff"):
        ra = Rect.from_degrees(*d["a"])
        rb = Rect.from_degrees(*d["b"])
        assert ra.directed_hausdorff_distance(rb) == pytest.approx(
            d["directed"], abs=1e-13
        ), d
        assert ra.hausdorff_distance(rb) == pytest.approx(
            d["undirected"], abs=1e-13
        ), d


def test_rect_bounder_matches_reference_bit_exact():
    from rust_s2_spark.geometry import point as pt2
    from rust_s2_spark.geometry.rect_bounder import RectBounder

    for d in _records("rect_bounder"):
        rb = RectBounder()
        pts = d["points"]
        for i in range(0, len(pts), 2):
            rb.add_point(
                pt2.latlng_rad_to_xyz(
                    math.radians(pts[i]), math.radians(pts[i + 1])
                )
            )
        b = rb.get_bound()
        assert (b.lat.lo, b.lat.hi, b.lng.lo, b.lng.hi) == (
            d["lat_lo"],
            d["lat_hi"],
            d["lng_lo"],
            d["lng_hi"],
        ), d["name"]


def test_expand_for_subregions_reference_cases():
    """Cases transcribed from the reference's inline test
    (rect_bounder.rs:652-760): full-expansion triggers and the
    9ε/π expansion arithmetic."""
    from rust_s2_spark.geometry.rect_bounder import expand_for_subregions

    eps = 2.220446049250313e-16

    def bound(x_lat, x_lng, y_lat, y_lng):
        from rust_s2_spark.geometry import point as pt2
        from rust_s2_spark.geometry.rect_bounder import RectBounder

        rb = RectBounder()
        rb.add_point(pt2.latlng_rad_to_xyz(x_lat, x_lng))
        rb.add_point(pt2.latlng_rad_to_xyz(y_lat, y_lng))
        return expand_for_subregions(rb.get_bound())

    # tiny rectangles near the antipodal axis expand to full
    assert bound(3e-16, 0, 1e-14, math.pi).is_full()
    assert bound(9e-16, 0, 1e-14, math.pi).is_full()
    assert bound(1e-16, 7e-16, 1e-14, math.pi).is_full()
    # and safely-separated ones do not
    assert not bound(1e-11, 0, 1e-9, math.pi).is_full()
    assert not bound(1e-11, 0, 1e-9, math.pi - 0.1).is_full()
    # a normal rect stays a slightly-expanded normal rect
    r = bound(0.1, 0.2, 0.3, 0.4)
    assert not r.is_full() and not r.is_empty()
    assert r.lat.hi >= 0.3 and r.lat.hi <= 0.3 + 100 * eps


def test_expanded_by_distance_uv_matches_reference_bit_exact():
    for d in _records("expanded_uv"):
        got = k.expanded_by_distance_uv(
            d["u_lo"], d["u_hi"], d["v_lo"], d["v_hi"], d["dist"]
        )
        assert [float(g) for g in got] == d["out"], d


def test_interpolate_at_distance_matches_reference():
    segs = {s["seg"]: s for s in _records("seg_dist")}
    for r in _records("interpolate_at_distance"):
        seg = segs[r["seg"]]
        a = np.array([_pt(*seg["a"])])
        b = np.array([_pt(*seg["b"])])
        p = ek.interpolate_at_distance(r["d"], a, b)[0]
        lat = math.degrees(math.atan2(p[2], math.hypot(p[0], p[1])))
        lng = math.degrees(math.atan2(p[1], p[0]))
        assert lat == pytest.approx(r["lat"], abs=1e-9), r
        if abs(abs(lat) - 90.0) > 1e-9:
            assert lng == pytest.approx(r["lng"], abs=1e-9), r


def test_region_predicates_match_reference():
    from rust_s2_spark.geometry.cell import Cell
    from rust_s2_spark.plans.driver_queries import (
        REGION_PRED_CAPS,
        REGION_PRED_RECTS,
    )

    for d in _records("region_pred"):
        if d["region"] == "cap":
            lat, lng, area = REGION_PRED_CAPS[d["ridx"]]
            la, lo = math.radians(lat), math.radians(lng)
            reg = Cap.from_center_area(
                (
                    math.cos(lo) * math.cos(la),
                    math.sin(lo) * math.cos(la),
                    math.sin(la),
                ),
                area,
            )
        else:
            reg = Rect.from_degrees(*REGION_PRED_RECTS[d["ridx"]])
        cell = Cell(d["cell"])
        assert bool(reg.contains_cell(cell)) == d["contains_cell"], d
        assert bool(reg.intersects_cell(cell)) == d["intersects_cell"], d


def test_all_region_types_cover_like_reference():
    """Coverings for Cell, Point, and CellUnion regions (the remaining
    Region impls beyond Cap/Rect) match the reference cell-for-cell."""
    from rust_s2_spark.geometry.cell import Cell
    from rust_s2_spark.geometry.cellunion import CellUnion
    from rust_s2_spark.geometry.point_region import PointRegion

    n = 0
    for d in _records("covering2"):
        rc = RegionCoverer(
            min_level=d["min_level"],
            max_level=d["max_level"],
            level_mod=d["level_mod"],
            max_cells=d["max_cells"],
        )
        if d["region"] == "cell":
            reg = Cell(d["id"])
        elif d["region"] == "point":
            reg = PointRegion.from_latlng_degrees(d["lat"], d["lng"])
        else:
            reg = CellUnion(
                k.from_token(np.array(d["input"])), normalized=True
            )
        assert list(rc.covering(reg).tokens()) == d["covering"], d
        assert list(rc.interior_covering(reg).tokens()) == d["interior"], d
        assert list(rc.fast_covering(reg).tokens()) == d["fast"], d
        n += 3
    assert n == 240


def _rand_rect(rng) -> Rect:
    from rust_s2_spark.geometry.intervals import PI, R1Interval, S1Interval

    lats = sorted(rng.uniform(-math.pi / 2, math.pi / 2, size=2))
    lngs = rng.uniform(-math.pi, math.pi, size=2)
    lng = S1Interval.from_point_pair(float(lngs[0]), float(lngs[1]))
    return Rect(R1Interval(float(lats[0]), float(lats[1])), lng)


def test_directed_hausdorff_random_pairs_vs_sampling():
    """Port of rect.rs:2155-2220 verify_directed_hausdorff_distance:
    sample rect a on a 0.1-rad grid; the directed hausdorff must be >=
    every sampled point's exact distance to b (minus fp noise) and
    within one grid resolution of the sampled max. Also exercises the
    lng-complement rects the reference adds for topology coverage."""
    from rust_s2_spark.geometry.intervals import R1Interval

    rng = np.random.default_rng(20260818)
    resolution = 0.1

    def verify(a: Rect, b: Rect):
        if a.is_empty() or b.is_empty():
            return
        n_lat = int(round(a.lat.length() / resolution)) + 1
        n_lng = int(round(a.lng.length() / resolution)) + 1
        d_lat = a.lat.length() / n_lat
        d_lng = a.lng.length() / n_lng
        max_d = 0.0
        lng = a.lng.lo
        for _ in range(n_lng + 1):
            lat = a.lat.lo
            for _ in range(n_lat + 1):
                # normalize lng into [-pi, pi]
                ln = math.atan2(math.sin(lng), math.cos(lng))
                la = max(-math.pi / 2, min(math.pi / 2, lat))
                max_d = max(max_d, b.distance_to_latlng_rad(la, ln))
                lat += d_lat
            lng += d_lng
        got = a.directed_hausdorff_distance(b)
        assert max_d <= got + 1e-10, (a, b, max_d, got)
        assert max_d >= got - resolution, (a, b, max_d, got)

    for _ in range(60):
        a = _rand_rect(rng)
        b = _rand_rect(rng)
        a2 = Rect(R1Interval(a.lat.lo, a.lat.hi), a.lng.complement())
        b2 = Rect(R1Interval(b.lat.lo, b.lat.hi), b.lng.complement())
        verify(a, b)
        verify(a2, b)
        verify(a, b2)
        verify(a2, b2)


def test_distance_to_latlng_exact_vs_dense_boundary():
    """Exact rect distance (ref rect.rs:259-279) vs a dense sample of
    the rect's boundary + interior grid."""
    rng = np.random.default_rng(4242)
    for _ in range(60):
        r = _rand_rect(rng)
        lat = float(rng.uniform(-math.pi / 2, math.pi / 2))
        lng = float(rng.uniform(-math.pi, math.pi))
        got = r.distance_to_latlng_rad(lat, lng)
        if r.contains_latlng_rad(lat, lng):
            assert got == 0.0
            continue
        # dense grid over the rect
        best = math.inf
        for i in range(41):
            for j in range(41):
                la = r.lat.lo + (r.lat.hi - r.lat.lo) * i / 40
                ln = r.lng.lo + r.lng.length() * j / 40
                ln = math.atan2(math.sin(ln), math.cos(ln))
                cosang = np.dot(
                    pt.latlng_rad_to_xyz(lat, lng), pt.latlng_rad_to_xyz(la, ln)
                )
                best = min(best, math.acos(max(-1.0, min(1.0, cosang))))
        assert got <= best + 1e-9
        assert got >= best - 0.08  # grid resolution bound


def test_angle_encodings_match_reference():
    """E5/E6/E7 integer encodings bit-exact vs the reference dump
    (s1/angle.rs convert_i32!): forward ints exactly equal, backward
    degree/radian doubles bit-for-bit (pure * / by the same constants)."""
    from rust_s2_spark.kernels import angle as ak

    recs = list(_records("angle_encoding"))
    assert len(recs) >= 30
    degs = np.array([float(d["deg"]) for d in recs])
    for kk in (5, 6, 7):
        got = ak.deg_to_e(degs, kk)
        want = np.array([int(d[f"e{kk}"]) for d in recs], dtype=np.int32)
        assert (got == want).all(), kk
        back = ak.e_to_deg(want, kk)
        want_back = np.array([float(d[f"deg_from_e{kk}"]) for d in recs])
        assert (back == want_back).all(), kk  # bit-for-bit
    rad = ak.e_to_rad(np.array([int(d["e7"]) for d in recs], dtype=np.int32), 7)
    want_rad = np.array([float(d["rad_from_e7"]) for d in recs])
    assert (rad == want_rad).all()
    # ties away from zero, not numpy's half-even
    assert ak.deg_to_e(np.array([0.000005]), 5)[0] == 1
    assert ak.deg_to_e(np.array([-0.000005]), 5)[0] == -1
    assert ak.deg_to_e(np.array([0.000015]), 5)[0] == 2


def test_cap_pair_predicates_match_reference():
    """contains/intersects/interior_intersects over all dumped cap pairs
    (ref cap.rs:181-209)."""
    params = [
        (0.0, 0.0, 0.5), (0.0, 0.0, 2.0), (1.0, 1.0, 0.5), (10.0, 10.0, 1.0),
        (0.0, 180.0, 2.0), (90.0, 0.0, 0.3), (-90.0, 0.0, 0.3), (47.3, 8.5, 5.0),
        (0.0, 0.1, 1e-12), (0.0, 0.0, 12.56), (45.0, 45.0, 3.0), (-45.0, 135.0, 0.05),
    ]
    caps = [
        Cap.from_center_area(pt.latlng_to_xyz(la, ln), ar) for la, ln, ar in params
    ]
    recs = list(_records("cap_pair"))
    assert len(recs) == len(caps) ** 2
    for d in recs:
        a, b = caps[d["i"]], caps[d["j"]]
        assert a.contains_cap(b) == d["contains"], (d["i"], d["j"])
        assert a.intersects_cap(b) == d["intersects"], (d["i"], d["j"])
        assert a.interior_intersects(b) == d["interior_intersects"], (d["i"], d["j"])
    # from_center_chordangle is the identity constructor on chord²
    c = Cap.from_center_chordangle((1.0, 0.0, 0.0), 0.25)
    assert c.radius2 == 0.25 and c.center == (1.0, 0.0, 0.0)


def _api_rects():
    return [
        Rect.from_degrees(10.0, 20.0, 30.0, 40.0),
        Rect.from_degrees(10.0, 20.0, 30.0, 40.0),
        Rect.from_degrees(10.000000000000002, 20.0, 30.0, 40.0),
        Rect.from_degrees(10.1, 20.0, 30.0, 40.0),
        Rect.from_degrees(15.0, 25.0, 25.0, 35.0),
        Rect.from_degrees(10.0, 170.0, 30.0, -170.0),
        Rect.from_degrees(12.0, 175.0, 28.0, -175.0),
        Rect.empty(),
        Rect.full(),
        Rect.from_degrees(-90.0, -180.0, 90.0, 180.0),
    ]


def test_rect_approx_eq_and_interior_match_reference():
    rects = _api_rects()
    lls = [
        (10.0, 20.0), (20.0, 30.0), (10.000001, 30.0), (29.999999, 39.999999),
        (0.0, 0.0), (20.0, 180.0), (20.0, -178.0),
    ]
    for d in _records("rect_pair"):
        a, b = rects[d["i"]], rects[d["j"]]
        assert a.approx_eq(b) == d["approx_eq"], (d["i"], d["j"])
        assert a.contains_rect(b) == d["contains"], (d["i"], d["j"])
        assert a.interior_contains_rect(b) == d["interior_contains"], (d["i"], d["j"])
    for d in _records("rect_ll"):
        a = rects[d["i"]]
        la, ln = lls[d["m"]]
        lar, lnr = math.radians(la), math.radians(ln)
        assert a.contains_latlng_rad(lar, lnr) == d["contains_ll"], (d["i"], d["m"])
        assert (
            a.interior_contains_latlng_rad(lar, lnr) == d["interior_contains_ll"]
        ), (d["i"], d["m"])


def test_from_face_pos_level_and_raw_point_match_reference():
    for d in _records("fpl"):
        got = k.from_face_pos_level(
            np.array([d["face"]], dtype=np.uint64),
            np.array([d["pos"]], dtype=np.uint64),
            d["level"],
        )
        assert int(got[0]) == d["id"], d
        x, y, z = k.raw_point(got)
        assert (float(x[0]), float(y[0]), float(z[0])) == (
            float(d["raw_x"]),
            float(d["raw_y"]),
            float(d["raw_z"]),
        ), d  # bit-for-bit


def test_child_iter_matches_reference():
    for d in _records("child_iter"):
        cid = int(d["id"])
        assert list(k.child_iter(cid)) == [int(x) for x in d["children"]]
        lvl = 30 - (((cid & -cid).bit_length() - 1) >> 1)
        assert list(k.child_iter(cid, lvl + 2)) == [
            int(x) for x in d["grandchildren"]
        ]
