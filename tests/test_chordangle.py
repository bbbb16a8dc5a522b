"""Port of the reference's ChordAngle test suite
(/root/reference/src/s1/chordangle.rs:272-424) against the vectorized
kernels/chordangle.py."""

from __future__ import annotations

import math

import numpy as np
import pytest

import rust_s2_spark.kernels.chordangle as ca

EPS = 1e-14  # the reference's f64_eq epsilon


def test_is_functions():
    cases = [
        # (value, is_neg, is_zero, is_inf, is_special)
        (0.0, False, True, False, False),
        (ca.NEGATIVE, True, False, False, True),
        (ca.STRAIGHT, False, False, False, False),
        (np.inf, False, False, True, True),
    ]
    for v, neg, zero, inf, special in cases:
        assert (v < 0) == neg
        assert (v == 0) == zero
        assert bool(np.isinf(v)) == inf
        assert bool(ca.is_special(v)) == special, v


def test_from_angle_roundtrip():
    for rad in (0.0, 1.0, -1.0, math.pi):
        got = float(ca.to_angle(ca.from_angle(rad)))
        assert got == pytest.approx(rad if rad >= 0 else -1.0, abs=1e-15)
    assert float(ca.from_angle(math.pi)) == ca.STRAIGHT
    assert math.isinf(float(ca.to_angle(ca.from_angle(np.inf))))


def _deg(d: float) -> float:
    return float(ca.from_angle(math.radians(d)))


def test_arithmetic():
    zero = 0.0
    d30, d60, d90, d120, d180 = (_deg(d) for d in (30, 60, 90, 120, 180))
    cases_add = [
        (zero, zero, zero),
        (d60, zero, d60),
        (zero, d60, d60),
        (d30, d60, d90),
        (d60, d30, d90),
        (d180, zero, d180),
        (d90, d90, d180),
        (d120, d90, d180),
        (d120, d120, d180),
        (d30, d180, d180),
        (d180, d180, d180),
    ]
    for a, b, want in cases_add:
        assert float(ca.add(a, b)) == pytest.approx(want, abs=EPS), (a, b)
    cases_sub = [
        (zero, zero, zero),
        (d60, d60, zero),
        (d180, d180, zero),
        (zero, d60, zero),
        (d30, d90, zero),
        (d90, d30, d60),
        (d90, d60, d30),
        (d180, zero, d180),
    ]
    for a, b, want in cases_sub:
        assert float(ca.sub(a, b)) == pytest.approx(want, abs=EPS), (a, b)


def test_trigonometry():
    iters = 40
    for i in range(iters + 1):
        radians = math.pi * i / iters
        c = ca.from_angle(radians)
        assert float(ca.sin(c)) == pytest.approx(math.sin(radians), abs=EPS)
        assert float(ca.cos(c)) == pytest.approx(math.cos(radians), abs=EPS)
        assert math.atan(float(ca.tan(c))) == pytest.approx(
            math.atan(math.tan(radians)), abs=EPS
        )
    a90 = ca.from_squared_length(2.0)
    a180 = ca.from_squared_length(4.0)
    assert float(ca.sin(a90)) == pytest.approx(1.0, abs=EPS)
    assert float(ca.cos(a90)) == pytest.approx(0.0, abs=EPS)
    assert np.isinf(ca.tan(a90)) or abs(float(ca.tan(a90))) > 1e15
    assert float(ca.sin(a180)) == pytest.approx(0.0, abs=EPS)
    assert float(ca.cos(a180)) == pytest.approx(-1.0, abs=EPS)
    assert float(ca.tan(a180)) == pytest.approx(0.0, abs=EPS)


def test_expanded():
    assert float(ca.expanded(ca.NEGATIVE, 5.0)) == ca.NEGATIVE
    assert np.isinf(ca.expanded(np.inf, -5.0))
    assert float(ca.expanded(0.0, -5.0)) == 0.0
    assert float(ca.expanded(1.25, 0.25)) == 1.5
    assert float(ca.expanded(0.75, 0.25)) == 1.0


def test_successor_predecessor():
    assert float(ca.successor(-1.0)) == 0.0
    assert np.isinf(ca.successor(4.0))
    x = 1.0
    assert float(ca.successor(x)) > x
    assert float(ca.predecessor(x)) < x
    assert float(ca.predecessor(ca.successor(x))) == x
    assert float(ca.predecessor(0.0)) == ca.NEGATIVE
    assert float(ca.predecessor(5.0)) == 4.0


def test_between_points_matches_manual():
    rng = np.random.default_rng(5)
    v = rng.normal(size=(50, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    w = rng.normal(size=(50, 3))
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    got = ca.between_points(v, w)
    want = np.minimum(4.0, ((v - w) ** 2).sum(axis=1))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # to_angle(between_points) equals the true angle
    ang = np.arccos(np.clip((v * w).sum(axis=1), -1, 1))
    np.testing.assert_allclose(ca.to_angle(got), ang, atol=1e-7)
