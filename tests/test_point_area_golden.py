"""point_area goldens incl. Girard degenerate cases
(reference point.rs:626-745) and common_ancestor_level cases
(reference cellid.rs:1345-1403)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from rust_s2_spark.kernels import cellid as k
from rust_s2_spark.kernels import edges as ek

PI = math.pi
EPS = 1e-10


def norm(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


PZ = norm([0, 0, 1])
P000 = norm([1, 0, 0])
P045 = norm([1, 1, 0])
P090 = norm([0, 1, 0])
P180 = norm([-1, 0, 0])
PR = norm([0.257, -0.5723, 0.112])
PQ = norm([-0.747, 0.401, 0.2235])
G1 = norm([1, 1, 1])
G2 = norm(norm([1, 1, 1]) + norm([0.257, -0.5723, 0.112]) * 1e-15)
G3 = norm(norm([1, 1, 1]) + norm([-0.747, 0.401, 0.2235]) * 1e-15)

AREA_CASES = [
    (P000, P090, PZ, PI / 2, 0.0),
    (P045, PZ, P180, 3 * PI / 4, 1e-14),
    (norm([EPS, 0, 1]), norm([0, EPS, 1]), PZ, 0.5 * EPS * EPS, 1e-14 + 1e-24),
    (PR, PR, PR, 0.0, 1e-15),
    (PR, PQ, PR, 0.0, 1e-15),
    (P000, P045, P090, 0.0, 1e-15),
    (P000, norm([1, 1, EPS]), P090, 5.8578643762690495119753e-11, 1e-9),
    (G1, G2, G3, 0.0, 1e-15),
]


@pytest.mark.parametrize("idx", range(len(AREA_CASES)))
def test_point_area(idx):
    a, b, c, want, near = AREA_CASES[idx]
    got = float(ek.point_area(a, b, c)[0])
    # relative-or-absolute nearness, as the reference's f64_near
    assert abs(got - want) <= max(near, near * abs(want) * 1e10 * 0 + near), (
        idx,
        got,
        want,
    )


def test_quarter_hemisphere_sums():
    for apex in (norm([1, 0.1 * EPS, EPS]), norm([1, 1, EPS])):
        area = (
            float(ek.point_area(apex, P000, P045)[0])
            + float(ek.point_area(apex, P045, P180)[0])
            + float(ek.point_area(apex, P180, PZ)[0])
            + float(ek.point_area(apex, PZ, P000)[0])
        )
        assert abs(area - PI) < 1e-9


def face(f):
    return k.from_face(np.array([f]))


def cbeg(ids, lvl):
    return k.child_begin_at_level(ids, lvl)


def cend(ids, lvl):
    return k.child_end_at_level(ids, lvl)


ANCESTOR_CASES = [
    (0, face(0), face(0)),
    (30, cbeg(face(0), 30), cbeg(face(0), 30)),
    (0, face(0), cbeg(face(0), 30)),
    (0, face(5), k.prev_id(cend(face(5), 30))),
    (-1, face(0), face(5)),
    (-1, cbeg(face(2), 30), cbeg(face(3), 20)),
    (8, cbeg(k.next_id(cbeg(face(5), 9)), 15), cbeg(cbeg(face(5), 9), 20)),
    (1, cbeg(cbeg(face(0), 2), 30), cbeg(k.next_id(cbeg(face(0), 2)), 5)),
]


@pytest.mark.parametrize("idx", range(len(ANCESTOR_CASES)))
def test_common_ancestor_golden(idx):
    want, c1, c2 = ANCESTOR_CASES[idx]
    assert int(k.common_ancestor_level(c1, c2)[0]) == want
    assert int(k.common_ancestor_level(c2, c1)[0]) == want
