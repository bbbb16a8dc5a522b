"""Property + regression suite for the edge DISTANCE kernels
(dist2_point_segment / max_dist2_point_segment / project_to_segment)
vs an independent refined-sampling brute force, with emphasis on
near-antipodal pairs — the reference's own regression style
(edgeutil.rs:718-818 update_min_interior_distance rejection/lower-
bound cases, edgeutil.rs:821-1056 check_max_distance table). r5's
lesson: property tests of exactness-adjacent kernels find real bugs
(stable_sign) that goldens alone miss."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rust_s2_spark.kernels import edges as ek

seed_s = st.integers(min_value=0, max_value=2**32 - 1)


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def _slerp(a, b, t):
    """Points along the geodesic from a to b at fractions t (the
    independent oracle — no kernel code). Gram-Schmidt form
    cos(s)·a + sin(s)·ŵ, NOT the sin((1-t)θ)a + sin(tθ)b slerp: for
    near-antipodal a, b the slerp numerator cancels catastrophically
    (b ≈ −a) and its sin θ ≈ 1e-7 denominator amplifies the θ rounding
    — checked against a 60-digit mpmath oracle, this form stays within
    ~1e-11 rad while slerp drifts by 1e-3 in that regime."""
    th = math.atan2(
        float(np.linalg.norm(np.cross(a, b))), float(np.dot(a, b))
    )
    w = b - float(np.dot(a, b)) * a
    nw = float(np.linalg.norm(w))
    if nw == 0.0:  # a == ±b exactly: the geodesic is degenerate
        return np.broadcast_to(a, (len(t), 3)).copy()
    w = w / nw
    s = t * th
    pts = np.cos(s)[:, None] * a + np.sin(s)[:, None] * w
    # row-normalize: a ~1e-10 norm deficit (w·a is not exactly 0) is
    # amplified by arcsin to a 5e-5 ANGLE error near pi — the chord
    # representation's sqrt-scale sensitivity at the antipode
    return pts / np.linalg.norm(pts, axis=1)[:, None]


def _angle(x, p):
    # numerically stable angle between unit vectors
    return 2.0 * np.arcsin(np.minimum(1.0, 0.5 * np.linalg.norm(p - x, axis=1)))


def _refined_extreme(x, a, b, kind, rounds=3, n=1025):
    """min/max angle from x to segment AB by sampling + 2 local
    refinements: effective step ~ pi/1024^3 => oracle error < 1e-8 rad
    (the angle along a geodesic is 1-Lipschitz in arc length)."""
    lo, hi = 0.0, 1.0
    arc = math.acos(float(np.clip(np.dot(a, b), -1.0, 1.0)))
    best_t = 0.0
    for _ in range(rounds):
        t = np.linspace(lo, hi, n)
        ang = _angle(x, _slerp(a, b, t))
        i = int(np.argmin(ang) if kind == "min" else np.argmax(ang))
        best = float(ang[i])
        best_t = float(t[i])
        step = (hi - lo) / (n - 1)
        lo, hi = max(0.0, t[i] - step), min(1.0, t[i] + step)
    return best, best_t, arc


def _rand_pair(seed, antipodal):
    rng = np.random.RandomState(seed)
    a = _unit(rng.standard_normal(3))
    if antipodal:
        # b within ~1e-7 of -a: the regime where naive formulations die
        b = _unit(-a + 1e-7 * rng.standard_normal(3))
    else:
        b = _unit(rng.standard_normal(3))
    mode = seed % 3
    if mode == 0:
        x = _unit(rng.standard_normal(3))
    elif mode == 1:  # x near the segment: tiny true min distance
        t = rng.uniform(0.0, 1.0)
        x = _unit(_slerp(a, b, np.array([t]))[0] + 1e-9 * rng.standard_normal(3))
    else:  # x near the segment's antipode: max ~ pi, min ~ pi
        t = rng.uniform(0.0, 1.0)
        x = _unit(-_slerp(a, b, np.array([t]))[0] + 1e-9 * rng.standard_normal(3))
    return x, a, b


def _check_min(x, a, b):
    d2 = float(ek.dist2_point_segment(x[None], a[None], b[None])[0])
    got = 2.0 * math.asin(min(1.0, 0.5 * math.sqrt(d2)))
    want, _, _ = _refined_extreme(x, a, b, "min")
    # kernel is the continuous min: it may only sit BELOW the sampled
    # oracle (up to the kernel's own ~1e-9 rad rounding, measured
    # against a 60-digit mpmath oracle over 120 adversarial cases) and
    # within the oracle's refinement bound above
    assert got <= want + 1e-8, (got, want)
    assert want - got <= 1e-7, (got, want)
    # endpoint sanity: never above either endpoint distance
    ea = float(_angle(x, a[None])[0])
    eb = float(_angle(x, b[None])[0])
    assert got <= min(ea, eb) + 1e-12


def _check_max(x, a, b):
    d2 = float(ek.max_dist2_point_segment(x[None], a[None], b[None])[0])
    got = 2.0 * math.asin(min(1.0, 0.5 * math.sqrt(d2)))
    want, _, _ = _refined_extreme(x, a, b, "max")
    assert got >= want - 1e-8, (got, want)
    assert got - want <= 1e-7, (got, want)
    ea = float(_angle(x, a[None])[0])
    eb = float(_angle(x, b[None])[0])
    assert got >= max(ea, eb) - 1e-12


@settings(max_examples=150, deadline=None)
@given(seed=seed_s)
def test_min_distance_matches_refined_brute_force(seed):
    x, a, b = _rand_pair(seed, antipodal=False)
    _check_min(x, a, b)


@settings(max_examples=150, deadline=None)
@given(seed=seed_s)
def test_min_distance_near_antipodal_edges(seed):
    """AB spanning almost pi — the conservative-rejection regime the
    reference regression-tests (edgeutil.rs:745-818)."""
    x, a, b = _rand_pair(seed, antipodal=True)
    _check_min(x, a, b)


@settings(max_examples=150, deadline=None)
@given(seed=seed_s)
def test_max_distance_matches_refined_brute_force(seed):
    x, a, b = _rand_pair(seed, antipodal=False)
    _check_max(x, a, b)


@settings(max_examples=150, deadline=None)
@given(seed=seed_s)
def test_max_distance_near_antipodal_edges(seed):
    x, a, b = _rand_pair(seed, antipodal=True)
    _check_max(x, a, b)


@settings(max_examples=150, deadline=None)
@given(seed=seed_s)
def test_project_consistency(seed):
    """project_to_segment returns a unit point whose chord to x IS the
    kernel min (the two must not drift), and which lies on the AB
    great circle whenever the interior branch was taken."""
    x, a, b = _rand_pair(seed, antipodal=seed % 2 == 0)
    p = ek.project_to_segment(x[None], a[None], b[None])[0]
    assert abs(float(np.dot(p, p)) - 1.0) < 1e-9
    d2 = float(ek.dist2_point_segment(x[None], a[None], b[None])[0])
    pd2 = float(np.dot(x - p, x - p))
    assert min(4.0, pd2) <= d2 + 1e-15 and d2 <= pd2 + 1e-15


def test_reference_min_interior_rejection_cases():
    """edgeutil.rs:745-818: three near-antipodal triples where a
    non-conservative rejection test used to miss the interior minimum.
    The update_min_distance(x, a, b, MIN_DIST) call must report a
    distance BELOW the threshold — i.e. our computed chord² < 6.39e-26
    — or a 100 TB within-distance join silently drops matches."""
    min_dist = 6.3897233584120815e-26
    cases = [
        ((1.0, -4.6547732744037044e-11, -5.6374428459823598e-89),
         (1.0, -8.9031850507928352e-11, 0.0),
         (-0.99999999999996347, 2.7030110029169596e-07, 1.555092348806121e-99)),
        ((1.0, -4.7617930898495072e-13, 0.0),
         (-1.0, -1.6065916409055676e-10, 0.0),
         (1.0, 0.0, 9.9964883247706732e-35)),
        ((1.0, 0.0, 0.0),
         (1.0, -8.4965026896454536e-11, 0.0),
         (-0.99999999999966138, 8.2297529603339328e-07, 9.6070344113320997e-21)),
    ]
    for x, a, b in cases:
        d2 = float(
            ek.dist2_point_segment(
                np.array([x]), np.array([a]), np.array([b])
            )[0]
        )
        assert d2 < min_dist, (x, d2)


def test_reference_min_lower_bound_case():
    """edgeutil.rs:719-743: the lower-bound-optimization triple (x
    very close to a short edge). Kernel distance must match the
    refined oracle to ~1e-9 rad."""
    x = _unit((-0.017952729194524016, -0.30232422079175203, 0.95303607751077712))
    a = _unit((-0.017894725505830295, -0.30229974986194175, 0.95304493075220664))
    b = _unit((-0.017986591360900289, -0.30233851195954353, 0.95303090543659963))
    _check_min(x, a, b)


def test_reference_check_max_distance_table():
    """edgeutil.rs:821-1056: the 12-case update_max_distance table,
    ported verbatim (x, a, b, expected max angle)."""
    s2 = math.sqrt(2.0)
    cases = [
        ((1, 0, 1), (1, 0, 0), (0, 1, 0), math.pi / 2),
        ((1, 0, -1), (1, 0, 0), (0, 1, 0), math.pi / 2),
        ((0, 1, 1), (1, 0, 0), (0, 1, 0), math.pi / 2),
        ((0, 1, -1), (1, 0, 0), (0, 1, 0), math.pi / 2),
        ((1, 1, 1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(2.0 / 3.0))),
        ((1, 1, -1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(2.0 / 3.0))),
        ((1, 0, 0), (1, 1, 0), (1, -1, 0), math.pi / 4),
        ((0, 1, 0), (1, 1, 0), (1, 1, 0), math.pi / 4),
        ((0, 0, 1), (0, 1, 1), (0, -1, 1), math.pi / 4),
        ((0, 0, 1), (1, 0, 0), (1, 0, -1), 3 * math.pi / 4),
        ((0, 0, 1), (1, 0, 0), (1, 1, -s2), 3 * math.pi / 4),
        ((0, 0, 1), (0, 0, -1), (0, 0, -1), math.pi),
    ]
    for xi, ai, bi, want in cases:
        x, a, b = _unit(xi), _unit(ai), _unit(bi)
        d2 = float(ek.max_dist2_point_segment(x[None], a[None], b[None])[0])
        got = 2.0 * math.asin(min(1.0, 0.5 * math.sqrt(d2)))
        assert abs(got - want) < 1e-14, (xi, ai, bi, got, want)
