"""Hilbert-curve wrapping goldens (reference cellid.rs:1488-1634)."""

from __future__ import annotations

import numpy as np
import pytest

from rust_s2_spark.kernels import cellid as k

U = np.uint64


def face(f):
    return k.from_face(np.array([f]))


def from_face_pos_level(f: int, pos: int, lvl: int) -> np.ndarray:
    raw = ((f << 61) + (pos | 1)) & ((1 << 64) - 1)
    return k.parent(np.array([raw], dtype=np.uint64), lvl)


def test_wrap_begin_end():
    # wrap from beginning to end of the curve
    want = k.prev_id(k.child_end_at_level(face(5), 0))
    got = k.prev_wrap(k.child_begin_at_level(face(0), 0))
    assert got[0] == want[0]

    # smallest end leaf wraps to largest leaf via prev_wrap / advance_wrap(-1)
    biggest = from_face_pos_level(5, (2**64 - 1) >> 3, 30)
    first_leaf = k.child_begin_at_level(face(0), 30)
    assert k.prev_wrap(first_leaf)[0] == biggest[0]
    assert k.advance_wrap(first_leaf, -1)[0] == biggest[0]
    assert k.advance_wrap(first_leaf, -1)[0] == k.prev_wrap(first_leaf)[0]


def test_wrap_level4():
    # prev + next_wrap stays the same at a given level
    want = k.child_begin_at_level(face(0), 4)
    got = k.next_wrap(k.prev_id(k.child_end_at_level(face(5), 4)))
    assert got[0] == want[0]
    # advance_wrap forward and back
    got2 = k.advance_wrap(k.advance(k.child_end_at_level(face(5), 4), -1), 1)
    assert got2[0] == want[0]


def test_wrap_leaf():
    want = from_face_pos_level(0, 0, 30)
    got = k.next_wrap(k.prev_id(k.child_end_at_level(face(5), 30)))
    assert got[0] == want[0]
    got2 = k.advance_wrap(k.advance(k.child_end_at_level(face(5), 30), -1), 1)
    assert got2[0] == want[0]


def test_advance_wrap_cycles():
    # advancing 7 steps around the cube ends one past start
    start = k.child_begin_at_level(face(0), 0)
    assert k.advance_wrap(start, 7)[0] == face(1)[0]
    # twice around (12 faces) is identity
    assert k.advance_wrap(start, 12)[0] == start[0]
    assert k.advance_wrap(start, -12)[0] == start[0]
    # mixing advance and advance_wrap is consistent at deeper levels
    c = k.child_begin_at_level(face(3), 10)
    assert k.advance_wrap(k.advance_wrap(c, 12345), -12345)[0] == c[0]


def test_advance_golden():
    # reference cellid.rs advance cases (test_cellid_advance):
    # advance(7) from the first face cell reaches End (one past face 5)
    f0_begin = k.child_begin_at_level(face(0), 0)
    f5_end = k.child_end_at_level(face(5), 0)
    assert k.advance(f0_begin, 7)[0] == f5_end[0]
    # advance clamps at the ends
    assert k.advance(f0_begin, -1)[0] == f0_begin[0]
    leaf_begin = k.child_begin_at_level(face(0), 30)
    big = k.advance(leaf_begin, 6 * (1 << 60))
    end_leaf = k.child_end_at_level(face(5), 30)
    assert big[0] == end_leaf[0]


def test_cellid_continuity():
    """ref cellid.rs:1656-1685: sequentially increasing cell ids form a
    continuous path on the sphere (vectorized: the whole level-8 walk at
    once), raw centers land on the (s,t) half-grid, and advance_wrap(±1)
    matches next_wrap/prev_wrap."""
    import numpy as np

    from rust_s2_spark.kernels import cellid as k
    from rust_s2_spark.kernels import metric as metrics

    level = 8
    max_dist = metrics.MAX_WIDTH.value(level)
    begin = int(k.child_begin_at_level(np.array([k.from_face(np.array([0], dtype=np.uint64))[0]], dtype=np.uint64), level)[0])
    # all cells at the level, in Hilbert order
    n_cells = 6 * (1 << (2 * level))
    step = 1 << (2 * (30 - level) + 1)
    ids = (np.uint64(begin) + np.arange(n_cells, dtype=np.uint64) * np.uint64(step)).astype(np.uint64)
    x, y, z = k.cell_to_xyz(ids)
    p = np.stack([x, y, z], axis=1)
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    nxt = np.roll(p, -1, axis=0)
    ang = np.arccos(np.clip(np.einsum("ij,ij->i", p, nxt), -1, 1))
    assert float(ang.max()) < max_dist
    # advance_wrap(1) == next_wrap, advance_wrap(-1) inverts it
    nw = k.next_wrap(ids)
    np.testing.assert_array_equal(k.advance_wrap(ids, np.int64(1)), nw)
    np.testing.assert_array_equal(k.advance_wrap(nw, np.int64(-1)), ids)
    # centers on the half-grid in (s, t)
    f, u, v = k.xyz_to_face_uv(x, y, z)
    cell_size = 1.0 / (1 << level)
    for coord in (k.uv_to_st(u), k.uv_to_st(v)):
        r = np.remainder(coord, 0.5 * cell_size)
        r = np.minimum(r, 0.5 * cell_size - r)
        assert float(np.abs(r).max()) < 1e-12


def test_distance_from_begin_reference_cases():
    """ref cellid.rs:1406-1440: curve positions at both level extremes
    plus the decode round trip (begin + distance at the same level ==
    the id itself)."""
    import numpy as np

    from rust_s2_spark.kernels import cellid as k

    def one(cid):
        return np.array([cid], dtype=np.uint64)

    f5 = int(k.from_face(np.array([5], dtype=np.uint64))[0])
    f0 = int(k.from_face(np.array([0], dtype=np.uint64))[0])
    end0 = int(k.child_end_at_level(one(f5), 0)[0])
    assert int(k.distance_from_begin(one(end0))[0]) == 6
    end30 = int(k.child_end_at_level(one(f5), 30)[0])
    assert int(k.distance_from_begin(one(end30))[0]) == 6 * (1 << 60)
    begin0 = int(k.child_begin_at_level(one(f0), 0)[0])
    assert int(k.distance_from_begin(one(begin0))[0]) == 0
    begin30 = int(k.child_begin_at_level(one(f0), 30)[0])
    assert int(k.distance_from_begin(one(begin30))[0]) == 0
    # round trip: begin.advance(distance(id)) == id
    cid = int(k.parent(k.cell_from_latlng(np.array([5.0]), np.array([-120.0])), 12)[0])
    d = int(k.distance_from_begin(one(cid))[0])
    begin12 = int(k.child_begin_at_level(one(f0), 12)[0])
    assert int(k.advance(one(begin12), np.int64(d))[0]) == cid


def test_cell_contains_point_consistent_with_encode():
    """ref cell.rs test: for random points, the leaf cell from the point
    (and its ancestors) contain the point."""
    import numpy as np

    from rust_s2_spark.geometry.cell import Cell
    from rust_s2_spark.kernels import cellid as k

    rng = np.random.default_rng(77)
    v = rng.normal(size=(40, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    leaf = k.cell_from_xyz(v[:, 0], v[:, 1], v[:, 2])
    for i in range(40):
        p = tuple(v[i])
        for lvl in (30, 20, 10, 4):
            cid = int(k.parent(leaf[i : i + 1], lvl)[0])
            assert Cell(cid).contains_point(p), (i, lvl)
