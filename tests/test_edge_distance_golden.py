"""Point-to-segment distance goldens (reference edgeutil.rs:347-716,
14 cases, tolerance 1e-15 on the angle)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from rust_s2_spark.kernels import edges as ek


def norm(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


PI = math.pi

# (x, a, b, want_dist_rad, want_closest)
CASES = [
    ((1, 0, 0), (1, 0, 0), (0, 1, 0), 0.0, (1, 0, 0)),
    ((0, 1, 0), (1, 0, 0), (0, 1, 0), 0.0, (0, 1, 0)),
    ((1, 3, 0), (1, 0, 0), (0, 1, 0), 0.0, (1, 3, 0)),
    ((0, 0, 1), (1, 0, 0), (0, 1, 0), PI / 2, None),
    ((0, 0, -1), (1, 0, 0), (0, 1, 0), PI / 2, None),
    ((-1, -1, 0), (1, 0, 0), (0, 1, 0), 0.75 * PI, None),
    ((0, 1, 0), (1, 0, 0), (1, 1, 0), PI / 4, (1, 1, 0)),
    ((1, 1, -1), (1, 0, 0), (0, 1, 0), math.asin(math.sqrt(1.0 / 3.0)), (1, 1, 0)),
    ((-1, 0, 0), (1, 1, 0), (1, 1, 0), 0.75 * PI, (1, 1, 0)),
    ((0, 0, -1), (1, 1, 0), (1, 1, 0), PI / 2, (1, 1, 0)),
    ((-1, 0, 0), (1, 0, 0), (1, 0, 0), PI, (1, 0, 0)),
]


@pytest.mark.parametrize("case", CASES)
def test_distance_golden(case):
    x, a, b, want, closest = case
    xx, aa, bb = norm(x)[None, :], norm(a)[None, :], norm(b)[None, :]
    with np.errstate(invalid="ignore", divide="ignore"):
        d2 = float(ek.dist2_point_segment(xx, aa, bb)[0])
    got = 2.0 * math.asin(0.5 * math.sqrt(min(4.0, d2)))
    assert abs(got - want) < 1e-13, (case, got)
    if closest is not None and want > 0:
        with np.errstate(invalid="ignore", divide="ignore"):
            cp = ek.project_to_segment(xx, aa, bb)[0]
        assert np.allclose(cp, norm(closest), atol=1e-14), (case, cp)


def test_max_dist2_point_segment_vs_dense_sampling():
    """max over the segment == max over a dense interpolation sample
    (ref edgeutil.rs:202-218 semantics), including the antipodal
    (> right angle) branch."""
    import numpy as np

    from rust_s2_spark.kernels import edges as ek

    rng = np.random.default_rng(99)

    def unit(v):
        return v / np.linalg.norm(v)

    for _ in range(200):
        a = unit(rng.normal(size=3))
        b = unit(rng.normal(size=3))
        x = unit(rng.normal(size=3))
        got = float(
            ek.max_dist2_point_segment(x[None], a[None], b[None])[0]
        )
        ts = np.linspace(0.0, 1.0, 400)
        pts = ek.interpolate(ts, a[None], b[None])
        d = pts - x[None]
        dense = float(np.max(np.einsum("ij,ij->i", d, d)))
        assert got >= dense - 1e-9
        assert got <= dense + 2e-4  # sampling gap on the far side


def test_frames_roundtrip_and_reference_identities():
    """point.rs:885-905 frame identities: to_frame(m, column_k) = e_k,
    from_frame(m, e_k) = column_k, and M is orthonormal."""
    import numpy as np

    from rust_s2_spark.kernels import edges as ek

    rng = np.random.default_rng(17)
    p = rng.normal(size=(20, 3))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    m = ek.frame(p)
    # column 2 is p itself
    np.testing.assert_allclose(m[:, :, 2], p, atol=0)
    # orthonormal: M^T M = I
    mtm = np.einsum("nij,nik->njk", m, m)
    np.testing.assert_allclose(mtm, np.tile(np.eye(3), (20, 1, 1)), atol=1e-14)
    # to_frame(m, col_k) == e_k and from_frame inverts it
    for kk in range(3):
        ek_vec = np.zeros((20, 3))
        ek_vec[:, kk] = 1.0
        got = ek.to_frame(m, m[:, :, kk])
        np.testing.assert_allclose(got, ek_vec, atol=1e-14)
        back = ek.from_frame(m, ek_vec)
        np.testing.assert_allclose(back, m[:, :, kk], atol=1e-14)
    # planar centroid of a degenerate triangle is the point itself
    pc = ek.planar_centroid(p, p, p)
    np.testing.assert_allclose(pc, p, atol=0)
