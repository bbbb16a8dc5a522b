"""Point-in-polygon join (SURVEY.md §2.8).

Plan: cover the loop (RegionCoverer) → pushdown range predicate on
the biased cell id → rows in interior-covering cells pass without
geometry; boundary-cell rows get the crossing-parity kernel.

The boundary kernel uses a PER-CELL EDGE INDEX (the reference design:
SURVEY §2.8 PIP recipe / ref edge_clipping.rs:602-669 machinery): each
boundary covering cell is indexed driver-side with (a) the containment
state of its center and (b) the conservative set of polygon edges whose
bound intersects the cell's bound. A boundary row then only tests the
SHORT geodesic cell-center→point against its cell's candidate edges —
S2 cells are intersections of four hemispheres, hence geodesically
convex, so any edge crossing that segment must intersect the cell and
is guaranteed to be in the index. Kernel peak memory is
O(batch × edges-per-cell), not O(batch × total-edges): a 10k-vertex
polygon no longer builds a 2.4 GB array per Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from ..geometry import RegionCoverer
from ..geometry.loop import Loop
from ..kernels import cellid as k
from .covering_join import (
    CoveringRanges,
    covering_ranges,
    interior_predicate,
    range_predicate,
)

PIP_COVERER = RegionCoverer(min_level=0, max_level=18, level_mod=1, max_cells=64)


def loop_contains_expr(region, lat_col: str, lng_col: str) -> Column:
    """Exact PIP as an Arrow-batched pandas UDF: crossing parity per
    loop, XORed across loops for polygons with holes. Accepts a Loop or
    a Polygon (anything with ``.loops`` or ``.vertices``/``.anchor``)."""
    loops = getattr(region, "loops", None) or [region]
    loop_verts = [lp.vertices.copy() for lp in loops]
    loop_anchors = [lp.anchor.copy() for lp in loops]

    @pandas_udf(BooleanType())
    def _pip(lat: pd.Series, lng: pd.Series) -> pd.Series:
        from ..kernels import edges as ek

        la = np.radians(lat.to_numpy(np.float64))
        lo = np.radians(lng.to_numpy(np.float64))
        cl = np.cos(la)
        p = np.stack([np.cos(lo) * cl, np.sin(lo) * cl, np.sin(la)], axis=1)
        n = len(p)
        inside = np.zeros(n, dtype=bool)
        for verts, anchor in zip(loop_verts, loop_anchors):
            m = verts.shape[0]
            a = np.repeat(verts, n, axis=0)
            b = np.repeat(np.roll(verts, -1, axis=0), n, axis=0)
            pp = np.tile(p, (m, 1))
            q = np.broadcast_to(anchor, (m * n, 3))
            crossings = np.asarray(ek.simple_crossing(q, pp, a, b)).reshape(m, n)
            inside ^= crossings.sum(axis=0) % 2 == 1
        return pd.Series(inside)

    return _pip(F.col(lat_col), F.col(lng_col))


def _build_edge_index(loops, boundary_cells: np.ndarray):
    """Driver-side per-cell edge index: for each boundary covering cell,
    (center, center-inside-state, conservative candidate edge ids).

    Candidates = edges whose RectBounder bound intersects the cell's
    rect_bound — both are conservative supersets, so every edge that
    truly intersects the cell is indexed (extra edges only cost cycles:
    simple_crossing is exact, non-crossing extras contribute parity 0).
    """
    from ..geometry.cell import Cell
    from ..geometry.rect_bounder import RectBounder

    A = np.concatenate([lp.vertices for lp in loops])
    B = np.concatenate([np.roll(lp.vertices, -1, axis=0) for lp in loops])
    edge_rects = []
    for ea, eb in zip(A, B):
        rb = RectBounder()
        rb.add_point((float(ea[0]), float(ea[1]), float(ea[2])))
        rb.add_point((float(eb[0]), float(eb[1]), float(eb[2])))
        edge_rects.append(rb.get_bound())
    cells = [Cell(int(c)) for c in boundary_cells]
    centers = np.array([c.center for c in cells], dtype=np.float64)
    state = np.zeros(len(cells), dtype=bool)
    for lp in loops:
        state ^= np.asarray(
            lp.contains_points(centers[:, 0], centers[:, 1], centers[:, 2])
        )
    indptr = [0]
    edge_ids: list[int] = []
    for c in cells:
        cr = c.rect_bound()
        edge_ids.extend(
            i for i, er in enumerate(edge_rects) if cr.intersects_rect(er)
        )
        indptr.append(len(edge_ids))
    return (
        A,
        B,
        centers,
        state,
        np.asarray(indptr, dtype=np.int64),
        np.asarray(edge_ids, dtype=np.int64),
    )


def loop_contains_expr_indexed(
    region, boundary_cells: np.ndarray, lat_col: str, lng_col: str, cell_col: str
) -> Column:
    """Exact PIP for rows already known to lie in a boundary covering
    cell: parity of the short geodesic cell-center→point against the
    cell's indexed edges, XORed with the precomputed center state.
    Batches over (points-in-cell × edges-of-cell) only."""
    loops = getattr(region, "loops", None) or [region]
    A, B, centers, state, indptr, edge_ids = _build_edge_index(loops, boundary_cells)
    rmin_u = k.range_min(np.asarray(boundary_cells, dtype=np.uint64))

    @pandas_udf(BooleanType())
    def _pip(lat: pd.Series, lng: pd.Series, cid: pd.Series) -> pd.Series:
        from ..kernels import edges as ek

        la = np.radians(lat.to_numpy(np.float64))
        lo = np.radians(lng.to_numpy(np.float64))
        cl = np.cos(la)
        p = np.stack([np.cos(lo) * cl, np.sin(lo) * cl, np.sin(la)], axis=1)
        leaf = cid.to_numpy(np.int64).view(np.uint64)
        # boundary cells are a normalized (sorted, disjoint) union: the
        # containing cell is the one whose range_min is the closest <= leaf
        idx = np.searchsorted(rmin_u, leaf, side="right") - 1
        inside = np.zeros(len(p), dtype=bool)
        for g in np.unique(idx):
            m = idx == g
            lo_e, hi_e = int(indptr[g]), int(indptr[g + 1])
            if hi_e == lo_e:
                inside[m] = state[g]
                continue
            eids = edge_ids[lo_e:hi_e]
            a, b = A[eids], B[eids]
            pp = p[m]
            gn, ne = pp.shape[0], len(eids)
            c = np.broadcast_to(centers[g], (gn * ne, 3))
            pr = np.repeat(pp, ne, axis=0)
            ar = np.tile(a, (gn, 1))
            br = np.tile(b, (gn, 1))
            crossings = np.asarray(ek.simple_crossing(c, pr, ar, br)).reshape(gn, ne)
            inside[m] = state[g] ^ (crossings.sum(axis=1) % 2 == 1)
        return pd.Series(inside)

    return _pip(F.col(lat_col), F.col(lng_col), F.col(cell_col))


def pip_filter(
    df: DataFrame,
    loop,
    coverer: RegionCoverer = PIP_COVERER,
    biased_col: str = "cell_id_biased",
    lat_col: str = "lat",
    lng_col: str = "lng",
    cell_col: str = "cell_id",
    indexed: bool = True,
) -> DataFrame:
    """Rows of df inside the region (a Loop, or a Polygon with holes).

    Two pushed-down scans unioned: interior-covering cells need no
    geometry at all; only boundary-cell rows pay the crossing-parity
    UDF. (A single ``interior OR udf`` filter would evaluate the UDF
    on every candidate row — vectorized UDFs are computed per batch
    before any when()/or short-circuit — and would also break parquet
    filter pushdown.)

    ``indexed=True`` (default, requires ``cell_col``) uses the per-cell
    edge index; ``indexed=False`` keeps the all-edges kernel (right for
    tiny polygons where the index build outweighs the scan)."""
    outer = coverer.covering(loop)
    inner = coverer.interior_covering(loop)
    flags = inner.contains_ids(outer.ids)
    lo = [int(x) for x in k.bias_u64(k.range_min(outer.ids))]
    hi = [int(x) for x in k.bias_u64(k.range_max(outer.ids))]
    ranges = CoveringRanges(lo, hi, [bool(b) for b in flags])
    certain = interior_predicate(ranges, biased_col)
    boundary_cells = outer.ids[~flags]
    boundary = CoveringRanges(
        lo=[l for l, i in zip(ranges.lo, ranges.interior) if not i],
        hi=[h for h, i in zip(ranges.hi, ranges.interior) if not i],
        interior=[False] * int((~flags).sum()),
    )
    inner_rows = df.where(certain)
    if len(boundary_cells) == 0:
        return inner_rows
    if indexed and cell_col in df.columns:
        exact = loop_contains_expr_indexed(
            loop, boundary_cells, lat_col, lng_col, cell_col
        )
    else:
        exact = loop_contains_expr(loop, lat_col, lng_col)
    boundary_rows = df.where(range_predicate(boundary, biased_col)).where(exact)
    return inner_rows.unionByName(boundary_rows)
