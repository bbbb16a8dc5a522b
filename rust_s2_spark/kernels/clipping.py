"""Edge → face segments → cell covering (SURVEY.md §2.7 #52-54).

Key geometric fact: a great circle lies in a plane n·p = 0 and the
face chart p(u,v) = axis0 + u·u_axis + v·v_axis is affine in (u,v),
so a geodesic is a straight LINE in each face's (u,v) chart. Face
segmentation therefore reduces to plane/plane intersections, and the
per-face cell rasterization to solving u(t)/v(t) = st_to_uv(grid)
for t — exact monotone 1-D crossings (the reference's clip machinery,
edge_clipping.rs, achieves the same with explicit error bounds; this
implementation trades those last-ulp guarantees for a small overlap
margin and is flagged for a bit-exactness pass in a later round).

Outputs feed the polyline→cell assignment operator (tight edge
coverings, vs. the buffered-cap covering in operators/polyline.py).
"""

from __future__ import annotations

import numpy as np

from . import cellid as k

# face boundary planes: the 12 cube edges lie on these 6 planes
_BOUNDARY_NORMALS = np.array(
    [
        [1.0, -1.0, 0.0],  # x = y
        [1.0, 1.0, 0.0],  # x = -y
        [1.0, 0.0, -1.0],  # x = z
        [1.0, 0.0, 1.0],  # x = -z
        [0.0, 1.0, -1.0],  # y = z
        [0.0, 1.0, 1.0],  # y = -z
    ]
)


def _norm(v):
    return v / np.linalg.norm(v)


def face_segments(a, b) -> list[tuple[int, float, float, float, float]]:
    """Subdivide geodesic AB at cube-face crossings.

    Returns [(face, u_a, v_a, u_b, v_b), ...] in order along the edge.
    Scalar per edge (query-side artifact); assumes the edge spans less
    than a half circle.
    """
    a = _norm(np.asarray(a, dtype=np.float64))
    b = _norm(np.asarray(b, dtype=np.float64))
    n = np.cross(a, b)
    nn = np.linalg.norm(n)
    if nn < 1e-300:
        raise ValueError("degenerate edge")
    n = n / nn

    # parametrize p(t) = normalize(a*cos(θt) + w*sin(θt)); crossings found
    # via intersection directions d = ±cross(n, boundary_normal)
    w = _norm(np.cross(n, a))
    theta = float(np.arctan2(np.dot(b, w), np.dot(b, a)))  # arc length to b

    ts = [0.0, theta]
    for bn in _BOUNDARY_NORMALS:
        d = np.cross(n, bn)
        dn = np.linalg.norm(d)
        if dn < 1e-15:
            continue
        d = d / dn
        for cand in (d, -d):
            t = float(np.arctan2(np.dot(cand, w), np.dot(cand, a)))
            if 1e-15 < t < theta - 1e-15:
                ts.append(t)
    ts = sorted(set(ts))

    # the 6 planes also slice through face interiors (e.g. y=z crosses
    # face 0 diagonally), so adjacent pieces on the same face are merged
    segs: list[tuple[int, float, float, float, float]] = []
    for t0, t1 in zip(ts[:-1], ts[1:]):
        if t1 - t0 < 1e-15:
            continue
        tm = 0.5 * (t0 + t1)
        pm = a * np.cos(tm) + w * np.sin(tm)
        face = int(k.xyz_to_face(pm[0:1], pm[1:2], pm[2:3])[0])
        p0 = a * np.cos(t0) + w * np.sin(t0)
        p1 = a * np.cos(t1) + w * np.sin(t1)
        u0, v0 = _face_uv_clamped(face, p0)
        u1, v1 = _face_uv_clamped(face, p1)
        if segs and segs[-1][0] == face:
            pf, pu0, pv0, _, _ = segs[-1]
            segs[-1] = (pf, pu0, pv0, u1, v1)
        else:
            segs.append((face, u0, v0, u1, v1))
    return segs


def _face_uv_clamped(face: int, p: np.ndarray) -> tuple[float, float]:
    u, v = k.face_xyz_to_uv(
        np.array([face]), p[0:1], p[1:2], p[2:3]
    )
    return float(np.clip(u[0], -1.0, 1.0)), float(np.clip(v[0], -1.0, 1.0))


def _st(x: float) -> float:
    return float(k.uv_to_st(np.array([x]))[0])


def _uv(x: float) -> float:
    return float(k.st_to_uv(np.array([x]))[0])


def edge_cells(a, b, level: int, max_cells: int = 4096) -> np.ndarray:
    """All level-L cells the geodesic AB passes through (tight edge
    covering): face segmentation + exact grid-crossing walk of the
    straight uv-line per face."""
    out: list[int] = []
    size = 1 << level  # cells per face side at this level
    for face, u0, v0, u1, v1 in face_segments(a, b):
        # t in [0,1] along the straight uv chord; grid crossings happen
        # where u(t) or v(t) equals a cell boundary in uv space
        ts = [0.0, 1.0]
        for (c0, c1) in ((u0, u1), (v0, v1)):
            lo, hi = min(c0, c1), max(c0, c1)
            s_lo, s_hi = _st(lo), _st(hi)
            j0 = int(np.floor(s_lo * size))
            j1 = int(np.ceil(s_hi * size))
            denom = c1 - c0
            if denom == 0.0:
                continue
            for g in range(max(j0, 1), min(j1, size) + 0):
                ug = _uv(g / size)
                t = (ug - c0) / denom
                if 0.0 < t < 1.0:
                    ts.append(t)
        ts = sorted(set(ts))
        for t0, t1 in zip(ts[:-1], ts[1:]):
            if t1 - t0 <= 0:
                continue
            tm = 0.5 * (t0 + t1)
            um = u0 + (u1 - u0) * tm
            vm = v0 + (v1 - v0) * tm
            i = int(np.clip(np.floor(_st(um) * (1 << 30)), 0, (1 << 30) - 1))
            j = int(np.clip(np.floor(_st(vm) * (1 << 30)), 0, (1 << 30) - 1))
            cid = k.parent(
                k.from_face_ij(np.array([face]), np.array([i]), np.array([j])),
                level,
            )
            out.append(int(cid[0]))
            if len(out) > max_cells:
                raise ValueError("edge covering exceeds max_cells; lower the level")
    return np.unique(np.array(out, dtype=np.uint64))


def polyline_cells(latlng_vertices, level: int) -> np.ndarray:
    """Tight level-L covering of a whole polyline."""
    import math

    pts = [
        (
            math.cos(math.radians(lo)) * math.cos(math.radians(la)),
            math.sin(math.radians(lo)) * math.cos(math.radians(la)),
            math.sin(math.radians(la)),
        )
        for la, lo in latlng_vertices
    ]
    cells = []
    for p0, p1 in zip(pts[:-1], pts[1:]):
        cells.append(edge_cells(p0, p1, level))
    return np.unique(np.concatenate(cells))
