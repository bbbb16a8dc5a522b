"""Point-in-polygon join (SURVEY.md §2.8).

Plan: cover the loop (RegionCoverer) → pushdown range predicate on
the biased cell id → rows in interior-covering cells pass without
geometry; boundary-cell rows get the vectorized crossing-parity
kernel (one Arrow batch per ~10k rows, numpy inside).
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


def pip_filter(
    df: DataFrame,
    loop,
    coverer: RegionCoverer = PIP_COVERER,
    biased_col: str = "cell_id_biased",
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Rows of df inside the region (a Loop, or a Polygon with holes).

    Two pushed-down scans unioned: interior-covering cells need no
    geometry at all; only boundary-cell rows pay the crossing-parity
    UDF. (A single ``interior OR udf`` filter would evaluate the UDF
    on every candidate row — vectorized UDFs are computed per batch
    before any when()/or short-circuit — and would also break parquet
    filter pushdown.)"""
    ranges = covering_ranges(loop, coverer)
    certain = interior_predicate(ranges, biased_col)
    boundary = CoveringRanges(
        lo=[lo for lo, i in zip(ranges.lo, ranges.interior) if not i],
        hi=[hi for hi, i in zip(ranges.hi, ranges.interior) if not i],
        interior=[False] * (len(ranges.lo) - sum(ranges.interior)),
    )
    inner_rows = df.where(certain)
    boundary_rows = df.where(range_predicate(boundary, biased_col)).where(
        loop_contains_expr(loop, lat_col, lng_col)
    )
    return inner_rows.unionByName(boundary_rows)
