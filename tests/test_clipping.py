"""face_segments + tight edge coverings (§2.7)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from rust_s2_spark.geometry import CellUnion
from rust_s2_spark.kernels import cellid as k
from rust_s2_spark.kernels import edges as ek
from rust_s2_spark.kernels.clipping import edge_cells, face_segments, polyline_cells


def ll(lat, lng):
    return (
        math.cos(math.radians(lng)) * math.cos(math.radians(lat)),
        math.sin(math.radians(lng)) * math.cos(math.radians(lat)),
        math.sin(math.radians(lat)),
    )


def test_face_segments_same_face():
    segs = face_segments(ll(10, 10), ll(12, 14))
    assert len(segs) == 1
    assert segs[0][0] == 0  # face 0 spans lng -45..45 near the equator


def test_face_segments_crossing():
    # 10°E to 80°E crosses the face-0/face-1 boundary at 45°E
    segs = face_segments(ll(0, 10), ll(0, 80))
    assert [s[0] for s in segs] == [0, 1]
    # the shared endpoint sits on the boundary u=±1
    assert abs(abs(segs[0][3]) - 1.0) < 1e-12
    # long edge across three faces
    segs3 = face_segments(ll(0, -60), ll(0, 60))
    assert [s[0] for s in segs3] == [4, 0, 1]


def test_edge_cells_cover_samples():
    rng = np.random.default_rng(17)
    for _ in range(10):
        lat0, lng0 = rng.uniform(-60, 60), rng.uniform(-170, 170)
        lat1 = lat0 + rng.uniform(-8, 8)
        lng1 = lng0 + rng.uniform(-8, 8)
        a, b = ll(lat0, lng0), ll(lat1, lng1)
        level = int(rng.integers(6, 11))
        cells = edge_cells(a, b, level)
        cu = CellUnion(cells, normalized=True)
        # every sample along the edge is inside the covering
        aa = np.array(a)[None, :]
        bb = np.array(b)[None, :]
        for t in np.linspace(0, 1, 60):
            p = ek.interpolate(float(t), aa, bb)[0]
            leaf = k.cell_from_xyz(p[0:1], p[1:2], p[2:3])
            assert cu.contains_ids(leaf)[0], (lat0, lng0, lat1, lng1, level, t)


def test_edge_cells_tightness():
    # covering size ~ edge length / cell size (within a small factor)
    a, b = ll(10, 10), ll(10, 20)
    level = 8
    cells = edge_cells(a, b, level)
    arc = math.radians(10) * math.cos(math.radians(10))
    from rust_s2_spark.kernels import metric as metrics

    expect = arc / metrics.AVG_EDGE.value(level)
    assert len(cells) <= 3 * expect + 8
    assert all(k.level(cells) == level)


def test_polyline_cells():
    line = [(38.0, -76.0), (40.7, -74.0), (43.0, -72.0)]
    cells = polyline_cells(line, 9)
    cu = CellUnion(cells, normalized=True)
    for (la0, lo0), (la1, lo1) in zip(line[:-1], line[1:]):
        a = np.array(ll(la0, lo0))[None, :]
        b = np.array(ll(la1, lo1))[None, :]
        for t in np.linspace(0, 1, 40):
            p = ek.interpolate(float(t), a, b)[0]
            leaf = k.cell_from_xyz(p[0:1], p[1:2], p[2:3])
            assert cu.contains_ids(leaf)[0]
