"""LatLng golden tests (reference latlng.rs:148-268): normalization,
point conversion, haversine distances."""

from __future__ import annotations

import math

import numpy as np
import pytest

from rust_s2_spark.geometry import point as pt
from rust_s2_spark.kernels import cellid as k

NORMALIZE_CASES = [
    ((21.8275043, 151.1979675), (21.8275043, 151.1979675)),
    ((21.8275043, -151.1979675), (21.8275043, -151.1979675)),
    ((95.0, 151.1979675), (90.0, 151.1979675)),
    ((-95.0, 151.1979675), (-90.0, 151.1979675)),
    ((21.8275043, 180.0), (21.8275043, 180.0)),
    ((21.8275043, -180.0), (21.8275043, -180.0)),
    ((21.8275043, 181.0012), (21.8275043, -178.9988)),
    ((21.8275043, -181.0012), (21.8275043, 178.9988)),
    ((256.0, 256.0), (90.0, -104.0)),
]


@pytest.mark.parametrize("pos,want", NORMALIZE_CASES)
def test_normalized(pos, want):
    lat, lng = pt.normalize_latlng_deg(*pos)
    d = pt.latlng_distance_rad(lat, lng, *want)
    assert d < math.radians(1e-13)


CONVERSION_CASES = [
    ((0.0, 0.0), (1, 0, 0)),
    ((90.0, 0.0), (6.12323e-17, 0, 1)),
    ((-90.0, 0.0), (6.12323e-17, 0, -1)),
    ((0.0, 180.0), (-1, 1.22465e-16, 0)),
    ((0.0, -180.0), (-1, -1.22465e-16, 0)),
    ((90.0, 180.0), (-6.12323e-17, 7.4988e-33, 1)),
    ((-90.0, -180.0), (-6.12323e-17, -7.4988e-33, -1)),
    (
        (-81.82750430354997, 151.19796752929685),
        (-0.12456788151479525, 0.0684875268284729, -0.989844584550441),
    ),
]


@pytest.mark.parametrize("ll,p", CONVERSION_CASES)
def test_point_conversion(ll, p):
    got = pt.latlng_to_xyz(*ll)
    for g, w in zip(got, p):
        assert abs(g - w) < 1e-14
    # inverse (vectorized kernel path)
    la, lo = k.xyz_to_latlng_deg(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
    )
    assert abs(math.radians(la[0]) - math.radians(ll[0])) < 1e-14
    is_polar = abs(ll[0]) == 90.0
    if not is_polar:
        assert abs(math.radians(lo[0]) - math.radians(ll[1])) < 1e-14


DISTANCE_CASES = [
    ((90.0, 0.0), (90.0, 0.0), 0.0, 0.0),
    ((-37.0, 25.0), (-66.0, -155.0), 77.0, 1e-13),
    ((0.0, 165.0), (0.0, -80.0), 115.0, 1e-13),
    ((47.0, -127.0), (-47.0, 53.0), 180.0, 2e-6),
]


@pytest.mark.parametrize("a,b,want_deg,tol", DISTANCE_CASES)
def test_distance(a, b, want_deg, tol):
    d = math.degrees(pt.latlng_distance_rad(*a, *b))
    assert abs(d - want_deg) <= tol
