"""Edge → face segments → cell covering (SURVEY.md §2.7 #52-54).

Face segmentation delegates to the exact port of the reference's clip
machinery (kernels/edge_clipping.py — the sum_equal / exit_axis layer
with the reference's error constants; tests/test_edge_clipping.py runs
the reference's own property suite against it). The per-face cell
rasterization solves u(t)/v(t) = st_to_uv(grid) for t — exact monotone
1-D crossings in each face's affine (u,v) chart.

Outputs feed the polyline→cell assignment operator (tight edge
coverings, vs. the buffered-cap covering in operators/polyline.py).
"""

from __future__ import annotations

import numpy as np

from . import cellid as k
from . import edge_clipping as ec

def _norm(v):
    return v / np.linalg.norm(v)


def face_segments(a, b) -> list[tuple[int, float, float, float, float]]:
    """Subdivide geodesic AB at cube-face crossings.

    Returns [(face, u_a, v_a, u_b, v_b), ...] in order along the edge.
    Exact machinery from kernels/edge_clipping.py (ref
    edge_clipping.rs:602-680); uv values clamped to the biunit square
    for the rasterizer."""
    a = _norm(np.asarray(a, dtype=np.float64))
    b = _norm(np.asarray(b, dtype=np.float64))
    segs = ec.face_segments(tuple(a), tuple(b))
    cl = lambda x: min(1.0, max(-1.0, x))  # noqa: E731
    return [
        (s.face, cl(s.a[0]), cl(s.a[1]), cl(s.b[0]), cl(s.b[1])) for s in segs
    ]


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
