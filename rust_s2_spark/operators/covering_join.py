"""Spatial covering joins (SURVEY.md §2.8).

The canonical S2 join: cover the query region with ≤ max_cells cells
(driver-side RegionCoverer), turn the covering into leaf-id ranges on
the *biased* long column, then either

* ``region_filter`` — ONE region: an OR-of-BETWEEN predicate literal.
  Pure Catalyst filter → pushed to the parquet/Iceberg scan, prunes
  row groups by cell_id_biased min/max. Boundary cells get the exact
  geometric post-filter; interior-covering cells skip it.

* ``region_join`` — MANY regions: a broadcast range join of the tiny
  (region_id, rmin, rmax, interior) table against the fact table.

At 100 TB both shapes avoid any shuffle of the fact table: the filter
is scan-local, and the ranges table broadcasts.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import chord2_expr, s2_biased, xyz_cols
from ..geometry import Cap, CellUnion, Rect, RegionCoverer
from ..kernels import cellid as k

DEFAULT_COVERER = RegionCoverer(min_level=0, max_level=30, level_mod=1, max_cells=24)


@dataclass(frozen=True)
class CoveringRanges:
    """Biased [lo, hi] leaf ranges + interior flags for one region."""

    lo: list[int]
    hi: list[int]
    interior: list[bool]


def covering_ranges(region, coverer: RegionCoverer = DEFAULT_COVERER) -> CoveringRanges:
    outer = coverer.covering(region)
    inner = coverer.interior_covering(region)
    lo = [int(x) for x in k.bias_u64(k.range_min(outer.ids))]
    hi = [int(x) for x in k.bias_u64(k.range_max(outer.ids))]
    interior = [bool(b) for b in inner.contains_ids(outer.ids)]
    return CoveringRanges(lo, hi, interior)


def range_predicate(ranges: CoveringRanges, biased_col) -> Column:
    c = F.col(biased_col) if isinstance(biased_col, str) else biased_col
    pred = F.lit(False)
    for lo, hi in zip(ranges.lo, ranges.hi):
        pred = pred | c.between(F.lit(lo), F.lit(hi))
    return pred


def interior_predicate(ranges: CoveringRanges, biased_col) -> Column:
    """True only inside interior-covering cells (no exact filter needed)."""
    c = F.col(biased_col) if isinstance(biased_col, str) else biased_col
    pred = F.lit(False)
    for lo, hi, inner in zip(ranges.lo, ranges.hi, ranges.interior):
        if inner:
            pred = pred | c.between(F.lit(lo), F.lit(hi))
    return pred


def cap_exact_predicate(cap: Cap, lat_col: str, lng_col: str) -> Column:
    """Exact cap membership as native SQL: chord²(p, center) ≤ radius²."""
    x, y, z = xyz_cols(lat_col, lng_col)
    return (
        chord2_expr(
            x, y, z, F.lit(cap.center[0]), F.lit(cap.center[1]), F.lit(cap.center[2])
        )
        <= F.lit(cap.radius2)
    )


def rect_exact_predicate(rect: Rect, lat_col: str, lng_col: str) -> Column:
    """Exact rect membership, wrap-aware, native SQL."""
    lat = F.radians(F.col(lat_col))
    lng = F.radians(F.col(lng_col))
    lat_ok = (lat >= F.lit(rect.lat.lo)) & (lat <= F.lit(rect.lat.hi))
    if rect.lng.is_full():
        lng_ok = F.lit(True)
    elif rect.lng.is_inverted():
        lng_ok = (lng >= F.lit(rect.lng.lo)) | (lng <= F.lit(rect.lng.hi))
    else:
        lng_ok = (lng >= F.lit(rect.lng.lo)) & (lng <= F.lit(rect.lng.hi))
    return lat_ok & lng_ok


def exact_predicate(region, lat_col: str, lng_col: str) -> Column:
    if isinstance(region, Cap):
        return cap_exact_predicate(region, lat_col, lng_col)
    if isinstance(region, Rect):
        return rect_exact_predicate(region, lat_col, lng_col)
    raise TypeError(f"no exact predicate for {type(region)}")


def region_filter(
    df: DataFrame,
    region,
    coverer: RegionCoverer = DEFAULT_COVERER,
    biased_col: str = "cell_id_biased",
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Rows of ``df`` inside ``region``: pushed-down covering ranges +
    exact geometric post-filter.

    Both predicates are ANDed as one conjunction: the range predicate
    stays a top-level conjunct so it reaches the parquet scan
    (PushedFilters + row-group min/max pruning on the Hilbert-sorted
    table). The exact filter is native codegen trig — cheap enough to
    evaluate on interior rows too. (An ``interior OR exact`` shape
    would make Catalyst distribute the AND and lose pushdown — that
    trick only pays when the exact test is a Python UDF; see
    operators/pip.py.)"""
    ranges = covering_ranges(region, coverer)
    candidate = range_predicate(ranges, biased_col)
    return df.where(candidate & exact_predicate(region, lat_col, lng_col))


def region_join(
    spark: SparkSession,
    df: DataFrame,
    regions: list,
    region_ids: list,
    coverer: RegionCoverer = DEFAULT_COVERER,
    biased_col: str = "cell_id_biased",
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Join ``df`` against many regions: broadcast range join + exact
    post-filter. Output = df columns + ``region_id``.

    Cap regions carry their (center, radius²) as columns of the
    broadcast ranges table, so the exact filter is ONE constant-size
    expression regardless of region count (a per-region CASE chain
    would grow the plan linearly — fatal with thousands of regions).
    Non-cap regions fall back to a per-region predicate chain.
    """
    all_caps = all(isinstance(r, Cap) for r in regions)
    rows = []
    for rid, region in zip(region_ids, regions):
        rr = covering_ranges(region, coverer)
        for lo, hi, inner in zip(rr.lo, rr.hi, rr.interior):
            if all_caps:
                cx, cy, cz = region.center
                rows.append((rid, lo, hi, inner, cx, cy, cz, region.radius2))
            else:
                rows.append((rid, lo, hi, inner))
    schema = "region_id long, rlo long, rhi long, rinterior boolean"
    if all_caps:
        schema += ", rcx double, rcy double, rcz double, rr2 double"
    ranges_df = spark.createDataFrame(rows, schema)

    j = df.join(
        F.broadcast(ranges_df),
        (F.col(biased_col) >= F.col("rlo")) & (F.col(biased_col) <= F.col("rhi")),
        "inner",
    )
    if all_caps:
        x, y, z = xyz_cols(lat_col, lng_col)
        exact = (
            chord2_expr(x, y, z, F.col("rcx"), F.col("rcy"), F.col("rcz"))
            <= F.col("rr2")
        )
        out = j.where(F.col("rinterior") | exact)
        return out.drop("rlo", "rhi", "rinterior", "rcx", "rcy", "rcz", "rr2")
    exact = F.lit(False)
    for rid, region in zip(region_ids, regions):
        exact = F.when(
            F.col("region_id") == F.lit(rid), exact_predicate(region, lat_col, lng_col)
        ).otherwise(exact)
    out = j.where(F.col("rinterior") | exact)
    return out.drop("rlo", "rhi", "rinterior")


def region_join_ancestors(
    spark: SparkSession,
    df: DataFrame,
    regions: list,
    region_ids: list,
    coverer: RegionCoverer = DEFAULT_COVERER,
    cell_col: str = "cell_id",
    lat_col: str = "lat",
    lng_col: str = "lng",
    fast: bool = True,
) -> DataFrame:
    """Many-region containment join as a PURE EQUI-JOIN (SURVEY.md §2.8
    "containment join": ancestor expansion; semantics = reference range
    containment cellid.rs:393-410 — a covering cell contains a leaf iff
    it is the leaf's ancestor at its own level).

    ``region_join`` (range form) broadcasts the ranges table but the
    BETWEEN predicate forces a BroadcastNestedLoopJoin: every fact row is
    tested against ALL range rows — linear per row, fatal at 10⁴⁺ regions.
    Here each fact row instead explodes into its ancestors at exactly the
    levels present in the coverings (level histogram, ≤31 and typically
    ≤8 — native bit arithmetic, JVM Generate, no Python), and the join is
    `ancestor == covering_cell`: hashable/sort-merge-able, shuffle
    co-locatable with the table's cell_id partitioning, O(1) per probe.

    Output and semantics match ``region_join`` exactly: df columns +
    ``region_id``, with the exact geometric post-filter applied to
    boundary-cell rows (covering cells within one region are disjoint, so
    a row matches at most one covering cell per region — no dedup needed).

    ``fast=True`` (default): regions are covered with ``fast_covering``
    (cell_union_bound + normalize — no heap refinement) and the exact
    filter runs on every candidate row. With thousands of regions this is
    the scale shape twice over: driver-side covering cost drops ~10× and
    the level histogram collapses to a handful of adjacent levels, so the
    fact-side explode factor stays ~4 instead of ~17. ``fast=False``
    uses the exact coverer + interior coverings (tighter candidates,
    interior rows skip the exact filter) — right for few large regions.
    """
    all_caps = all(isinstance(r, Cap) for r in regions)
    rows = []
    levels: set[int] = set()
    batch_fast = (
        fast
        and all_caps
        and coverer.min_level == 0
        and coverer.max_level == 30
        and coverer.level_mod == 1
        and coverer.max_cells >= 4
    )
    if batch_fast:
        # one vectorized pass over ALL regions' fast coverings (bit-equal
        # to the scalar path) — ~1000 caps in ~10ms instead of ~2s
        cx = np.array([r.center[0] for r in regions])
        cy = np.array([r.center[1] for r in regions])
        cz = np.array([r.center[2] for r in regions])
        r2 = np.array([r.radius2 for r in regions])
        pad, cnt = k.cap_fast_covering_xyz(cx, cy, cz, r2)
        for m, rid in enumerate(region_ids):
            ids = pad[m, : cnt[m]]
            for cid, lvl in zip(ids.view(np.int64), k.level(ids)):
                levels.add(int(lvl))
                rows.append(
                    (rid, int(cid), False, float(cx[m]), float(cy[m]),
                     float(cz[m]), float(r2[m]))
                )
    else:
        for rid, region in zip(region_ids, regions):
            if fast:
                outer = coverer.fast_covering(region)
                flags = np.zeros(len(outer.ids), dtype=bool)
            else:
                outer = coverer.covering(region)
                inner = coverer.interior_covering(region)
                flags = inner.contains_ids(outer.ids)
            lvls = k.level(outer.ids)
            for cid, lvl, flag in zip(outer.ids.view(np.int64), lvls, flags):
                levels.add(int(lvl))
                if all_caps:
                    ccx, ccy, ccz = region.center
                    rows.append(
                        (rid, int(cid), bool(flag), ccx, ccy, ccz, region.radius2)
                    )
                else:
                    rows.append((rid, int(cid), bool(flag)))
    schema = "region_id long, ccell long, rinterior boolean"
    if all_caps:
        schema += ", rcx double, rcy double, rcz double, rr2 double"
    cov_df = spark.createDataFrame(rows, schema)

    from ..functions import s2_parent

    anc = F.explode(
        F.array(*[s2_parent(cell_col, lv) for lv in sorted(levels)])
    ).alias("__anc")
    fact = df.select("*", anc)
    j = fact.join(cov_df, F.col("__anc") == F.col("ccell"), "inner")
    if all_caps:
        x, y, z = xyz_cols(lat_col, lng_col)
        exact = (
            chord2_expr(x, y, z, F.col("rcx"), F.col("rcy"), F.col("rcz"))
            <= F.col("rr2")
        )
        out = j.where(F.col("rinterior") | exact)
        return out.drop(
            "__anc", "ccell", "rinterior", "rcx", "rcy", "rcz", "rr2"
        )
    exact = F.lit(False)
    for rid, region in zip(region_ids, regions):
        exact = F.when(
            F.col("region_id") == F.lit(rid), exact_predicate(region, lat_col, lng_col)
        ).otherwise(exact)
    out = j.where(F.col("rinterior") | exact)
    return out.drop("__anc", "ccell", "rinterior")


def cells_per_region(df_joined: DataFrame, agg_level: int, cell_col: str = "cell_id"):
    from ..functions import s2_parent

    return (
        df_joined.groupBy("region_id", s2_parent(cell_col, agg_level).alias("cell"))
        .count()
    )


def within_distance_pairs(
    df: DataFrame,
    radius_deg: float,
    id_col: str = "image_id",
    lat_col: str = "lat",
    lng_col: str = "lng",
    cell_col: str = "cell_id",
) -> DataFrame:
    """Spatial self-join: all pairs (a < b) within ``radius_deg`` of each
    other — the classic within-distance join.

    Level L is chosen so the min cell width at L is at least the radius;
    then any qualifying pair lies in the same or edge/vertex-adjacent
    level-L cells (the kNN ring guarantee). Each point emits its own
    cell plus its ≤8-cell neighbor ring as join targets; candidates =
    equi-join of targets against own cells (ONE shuffle on the cell key,
    broadcastable if one side is small, salt-able if skewed); the exact
    chord² predicate then keeps true pairs, and a<b dedupes the
    symmetric ring double-finds.
    """
    import math as _math

    from ..functions import chord2_expr, s2_all_neighbors, s2_parent, xyz_cols
    from ..kernels import metric as metrics

    rad = _math.radians(radius_deg)
    lvl = max(0, min(30, metrics.MIN_WIDTH.max_level(rad)))
    s = 2.0 * _math.sin(0.5 * min(rad, _math.pi))
    chord2_max = s * s

    pts = df.select(
        F.col(id_col).alias("pid"),
        F.col(lat_col).alias("plat"),
        F.col(lng_col).alias("plng"),
        s2_parent(cell_col, lvl).alias("pcell"),
    )
    if lvl == 0:
        # level 0: the ring guarantee needs all faces — fall back to the
        # full 6-cell fan-out (radius is a large fraction of the sphere)
        faces = [int(x) for x in k.from_face(np.arange(6)).view(np.int64)]
        targets = pts.select(
            "pid",
            "plat",
            "plng",
            F.explode(F.array(*[F.lit(f) for f in faces])).alias("tcell"),
        )
    else:
        # all_neighbors requires a cell AT the ring level — ring around
        # the level-L parent, not the leaf
        targets = pts.select(
            "pid",
            "plat",
            "plng",
            F.explode(
                F.array_union(
                    F.array(F.col("pcell")),
                    s2_all_neighbors(F.col("pcell"), lvl),
                )
            ).alias("tcell"),
        )
    other = pts.select(
        F.col("pid").alias("qid"),
        F.col("plat").alias("qlat"),
        F.col("plng").alias("qlng"),
        F.col("pcell").alias("tcell"),
    )
    j = targets.join(other, "tcell").where(F.col("pid") < F.col("qid"))
    px, py, pz = xyz_cols("plat", "plng")
    qx, qy, qz = xyz_cols("qlat", "qlng")
    d2 = chord2_expr(px, py, pz, qx, qy, qz)
    return (
        j.where(d2 <= F.lit(chord2_max))
        .select(F.col("pid").alias("a"), F.col("qid").alias("b"))
        .distinct()
    )


def within_distance_join_df(
    df: DataFrame,
    probes: DataFrame,
    radius_deg: float,
    id_col: str = "image_id",
    lat_col: str = "lat",
    lng_col: str = "lng",
    cell_col: str = "cell_id",
    query_id_col: str = "query_id",
    qlat_col: str = "qlat",
    qlng_col: str = "qlng",
) -> DataFrame:
    """Two-table within-distance join with a DATAFRAME probe side:
    (query_id, image_id, dist_chord2) for every fact row within
    ``radius_deg`` of every probe ROW — the cross-table counterpart of
    ``within_distance_pairs`` and the fixed-radius counterpart of
    ``knn_join_df`` (reference semantics: point_index range query).

    Same ring guarantee, ONE round, no widening: level L is the finest
    whose min cell width covers the radius, so every qualifying fact
    lies in the probe's own level-L cell or its ≤8-neighbor ring. The
    probe side explodes its ring executor-side (pandas-UDF kernels);
    the fact side computes one native parent column; candidates are ONE
    equi-join on the cell key (shuffle co-locatable with the table's
    cell partitioning, AQE-broadcastable when the probe side is small,
    salt-able if skewed); the exact chord² predicate keeps true pairs.
    A (probe, fact) pair can match only once — the fact has ONE parent
    cell and the ring targets are distinct — so no dedup pass exists.
    """
    import math as _math

    from ..functions import (
        chord2_expr,
        s2_all_neighbors,
        s2_cell_from_latlng,
        s2_parent,
        xyz_cols,
    )
    from ..kernels import metric as metrics

    rad = _math.radians(radius_deg)
    lvl = max(0, min(30, metrics.MIN_WIDTH.max_level(rad)))
    s = 2.0 * _math.sin(0.5 * min(rad, _math.pi))
    chord2_max = s * s

    if lvl == 0:
        faces = [int(x) for x in k.from_face(np.arange(6)).view(np.int64)]
        ring = F.array(*[F.lit(f) for f in faces])
    else:
        qparent = s2_parent(
            s2_cell_from_latlng(F.col(qlat_col), F.col(qlng_col)), lvl
        )
        ring = F.array_union(F.array(qparent), s2_all_neighbors(qparent, lvl))
    cand = probes.select(
        query_id_col, qlat_col, qlng_col, F.explode(ring).alias("__tcell")
    )
    facts = df.withColumn("__pcell", s2_parent(cell_col, lvl))
    j = facts.join(cand, F.col("__pcell") == F.col("__tcell"), "inner")
    px, py, pz = xyz_cols(lat_col, lng_col)
    qx, qy, qz = xyz_cols(qlat_col, qlng_col)
    d2 = chord2_expr(px, py, pz, qx, qy, qz)
    return (
        j.withColumn("dist_chord2", d2)
        .where(F.col("dist_chord2") <= F.lit(chord2_max))
        .select(query_id_col, id_col, "dist_chord2")
    )


def radius_level_expr(chord2_col) -> Column:
    """Finest level whose MIN_WIDTH one-ring contract covers a per-row
    chord² threshold, clamped to [0, 30] — the trig-free 31-literal
    comparison ladder (no log/asin, no cross-engine libm in the gate):
    level L is valid for a probe iff min-width-chord²(L) >= its
    threshold, and the ladder is descending in L, so the answer is
    ``size(filter(ladder, t >= c2)) - 1``. Shared by
    ``within_distance_join_df_var`` and the boundary-sweep test so the
    two cannot drift."""
    import math as _math

    from ..kernels import metric as metrics

    ladder = []
    for lvl in range(31):
        w = metrics.MIN_WIDTH.value(lvl)
        s = 2.0 * _math.sin(0.5 * min(w, _math.pi))
        ladder.append(s * s)
    ladder_arr = F.array(*[F.lit(float(t)) for t in ladder])
    c2 = chord2_col if isinstance(chord2_col, Column) else F.col(chord2_col)
    lvl_col = F.size(F.filter(ladder_arr, lambda t: t >= c2)) - F.lit(1)
    return F.greatest(F.lit(0), F.least(F.lit(30), lvl_col))


def within_distance_join_df_var(
    df: DataFrame,
    probes: DataFrame,
    chord2_col: str = "chord2_max",
    id_col: str = "image_id",
    lat_col: str = "lat",
    lng_col: str = "lng",
    cell_col: str = "cell_id",
    query_id_col: str = "query_id",
    qlat_col: str = "qlat",
    qlng_col: str = "qlng",
    levels: "list[int] | tuple[int, ...] | None" = None,
) -> DataFrame:
    """VARIABLE-radius within-distance join: each probe ROW carries its
    own chord² threshold (caps-as-a-DataFrame — footprint joins with
    per-row sizes). The threshold is taken in chord² form so the match
    predicate is pure arithmetic: no engine-side trig in the gate, so
    the result is bit-stable across engines (the repo's no-libm rule).

    Per-probe ring level = the finest level whose min cell width still
    covers the probe's radius, computed EXACTLY as a comparison count
    against the 31 Python-precomputed min-width chord² literals (no
    log/asin — a native size(filter(...)) over a literal array).

    ONE scan of the fact side regardless of how many radius classes the
    probes span: each fact row explodes to its ancestors at exactly the
    ACTIVE levels (the probe-side level histogram, ≤ 31 values
    driver-collected as a bounded list — the ``region_join_ancestors``
    shape), and candidates are ONE equi-join on the composite
    (level, cell) key. The probe side (the small side) explodes its
    ring per active level. Per (probe, level) the exactness guarantee
    is exactly ``within_distance_join_df``'s one-round ring contract,
    and a fact row has ONE ancestor at the probe's level while ring
    targets are distinct — so no dedup pass exists.

    Probes with a NULL threshold are dropped up front: a pure-arithmetic
    ``<=`` gate can never match them (NULL-drop semantics, matching the
    literal-radius path's behavior for absent rows).

    ``levels``: optional precomputed ring-level set (the stats-injection
    pattern — plans.stats for kNN, this for variable radius). When
    given, the per-call probe-level ``distinct().collect()`` is SKIPPED
    entirely: on a repeated variable-radius workload the histogram is
    paid once by the caller, not once per call. Level 0 is implicitly
    added, and each probe joins at the COARSEST-SAFE clamp — the
    largest provided level ≤ its exact level. A coarser ring always
    covers a larger radius, so the one-round exactness contract holds
    for ANY clamp ≤ the exact level: ``levels`` can be a superset,
    subset, or guess of the true histogram and only performance moves
    (a probe clamped far coarser joins a wider ring; a level nothing
    clamps to costs one unused ancestor struct per fact row).
    """
    from ..functions import (
        chord2_expr,
        s2_all_neighbors,
        s2_cell_from_latlng,
        s2_parent,
        xyz_cols,
    )
    c2 = F.col(chord2_col)
    p = probes.where(c2.isNotNull()).select(
        query_id_col,
        qlat_col,
        qlng_col,
        c2.alias("__c2"),
        radius_level_expr(c2).alias("__lvl"),
    )
    if levels is None:
        active = sorted(
            int(r["__lvl"]) for r in p.select("__lvl").distinct().collect()
        )  # ≤ 31 rows to the driver
        if not active:  # empty (or all-NULL-threshold) probe set
            return df.select(
                F.lit(0).cast("long").alias(query_id_col),
                F.col(id_col),
                F.lit(0.0).alias("dist_chord2"),
            ).limit(0)
        p = p.withColumn("__jl", F.col("__lvl"))
    else:
        active = sorted({int(x) for x in levels} | {0})
        if any(not (0 <= x <= 30) for x in active):
            raise ValueError(f"levels must each be in [0, 30]: {levels}")
        # coarsest-safe clamp: largest provided level ≤ the exact
        # level (level 0 is in the set, so the filter is never empty)
        arr = F.array(*[F.lit(x) for x in active])
        p = p.withColumn(
            "__jl", F.array_max(F.filter(arr, lambda x: x <= F.col("__lvl")))
        )
    # probe side (small side): ring explode per active level, tagged
    # with the level it joins at
    cand = None
    for lvl in active:
        pl = p.where(F.col("__jl") == lvl)
        if lvl == 0:
            faces = [int(x) for x in k.from_face(np.arange(6)).view(np.int64)]
            ring = F.array(*[F.lit(f) for f in faces])
        else:
            qparent = s2_parent(
                s2_cell_from_latlng(F.col(qlat_col), F.col(qlng_col)), lvl
            )
            ring = F.array_union(
                F.array(qparent), s2_all_neighbors(qparent, lvl)
            )
        c = pl.select(
            query_id_col, qlat_col, qlng_col, "__c2",
            F.lit(lvl).alias("__qlvl"),
            F.explode(ring).alias("__tcell"),
        )
        cand = c if cand is None else cand.unionByName(c)
    # fact side: ONE scan — ancestors at exactly the active levels,
    # one native Generate (no Python, no per-level rescans)
    anc = F.array(*[
        F.struct(
            F.lit(lvl).alias("__jlvl"),
            s2_parent(cell_col, lvl).alias("__pcell"),
        )
        for lvl in active
    ])
    facts = df.select("*", F.inline(anc))
    px, py, pz = xyz_cols(lat_col, lng_col)
    qx, qy, qz = xyz_cols(qlat_col, qlng_col)
    j = facts.join(
        cand,
        (F.col("__jlvl") == F.col("__qlvl"))
        & (F.col("__pcell") == F.col("__tcell")),
        "inner",
    )
    return (
        j.withColumn("dist_chord2", chord2_expr(px, py, pz, qx, qy, qz))
        .where(F.col("dist_chord2") <= F.col("__c2"))
        .select(query_id_col, id_col, "dist_chord2")
    )


def region_anti_filter(
    df: DataFrame,
    regions: list,
    coverer: RegionCoverer = DEFAULT_COVERER,
    biased_col: str = "cell_id_biased",
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Rows of ``df`` inside NONE of the regions — geofence EXCLUSION
    (the complement of ``region_filter`` over the region set; reference
    semantics: negated region containment, region.rs contains_point).

    One scan, zero shuffle: each region contributes its
    ``covering-range AND exact`` membership conjunction and the filter
    is ``NOT (OR over regions)``. Negation kills range pushdown by
    nature (an anti-join must look at every row), but the per-row cost
    stays native codegen trig. The OR chain grows with region count —
    right for tens of regions; for thousands use
    ``region_anti_join`` (equi-join candidates + left_anti).

    NULL coordinates are inside no region, so such rows are KEPT —
    the membership OR is coalesced to false (bare ``NOT(NULL)`` would
    silently drop them, diverging from the left_anti regime, which
    keeps unmatched rows by construction).
    """
    member = F.lit(False)
    for region in regions:
        ranges = covering_ranges(region, coverer)
        member = member | (
            range_predicate(ranges, biased_col)
            & exact_predicate(region, lat_col, lng_col)
        )
    return df.where(~F.coalesce(member, F.lit(False)))


def region_anti_join(
    spark: SparkSession,
    df: DataFrame,
    regions: list,
    coverer: RegionCoverer = DEFAULT_COVERER,
    cell_col: str = "cell_id",
    lat_col: str = "lat",
    lng_col: str = "lng",
    id_col: str = "image_id",
    fast: bool = True,
) -> DataFrame:
    """Geofence exclusion at region-table scale: rows of ``df`` inside
    NONE of the ``regions``, as a LEFT ANTI join against the matched-id
    set of ``region_join_ancestors`` (pure equi-join candidates + exact
    post-filter — the 10⁴-region shape).

    Cost is the standard distributed anti-join: one fact scan to build
    the (small) matched-id set, one anti-join shuffle keyed on
    ``id_col``. Requires ``id_col`` to identify rows uniquely (the
    anti-join key).
    """
    matched = region_join_ancestors(
        spark, df.select(id_col, cell_col, lat_col, lng_col),
        regions, list(range(len(regions))),
        coverer=coverer, cell_col=cell_col,
        lat_col=lat_col, lng_col=lng_col, fast=fast,
    ).select(id_col).distinct()
    return df.join(matched, id_col, "left_anti")
