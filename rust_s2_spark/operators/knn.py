"""kNN join: k nearest images per query point (SURVEY.md §2.8).

Plan (Spark-first, no per-row Python):
1. Driver-side: pick a seed cell level from the expected neighbor
   radius (MIN_WIDTH metric), compute each query's candidate ring =
   its cell + all_neighbors at that level (tiny, per query).
2. Broadcast-join the exploded (query_id, candidate_cell) table
   against the fact table on parent-at-level equality (native bit
   arithmetic — equi-join, broadcastable).
3. chord² distance (native SQL) + window rank ≤ k.
4. Exactness: a 3×3 all_neighbors ring around the query's cell is
   guaranteed to contain every point within one cell min-width of the
   query. A query's top-k is final only when its k-th distance is
   below that bound; otherwise the ring is widened (coarser level)
   and only the unresolved queries are retried.

At scale the equi-join on the parent column co-locates with the
table's cell_id partitioning, so only the (small) candidate side moves.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import chord2_expr, s2_parent, xyz_cols
from ..kernels import cellid as k
from ..kernels import metric as metrics


def _candidate_cells(lat: np.ndarray, lng: np.ndarray, level: int) -> list[np.ndarray]:
    """Per-query candidate cells: own cell + all neighbors at level.

    At level 0 the 3×3 neighbor ring only reaches 5 of the 6 faces (the
    antipodal face is two steps away), yet _safe_chord2(0) promises the
    whole sphere — so level 0 uses all six face cells explicitly.
    """
    if level <= 0:
        faces = k.from_face(np.arange(6, dtype=np.uint64))
        return [faces.copy() for _ in range(len(lat))]
    ids = k.parent(k.cell_from_latlng(lat, lng), level)
    rings = k.all_neighbors(ids, level)
    return [
        np.unique(np.concatenate([[ids[i]], rings[i]])).astype(np.uint64)
        for i in range(len(ids))
    ]


def _safe_chord2(level: int) -> float:
    """Chord² radius certainly covered by the 3×3 ring at this level."""
    if level <= 0:
        return 4.0  # whole sphere
    w = metrics.MIN_WIDTH.value(level)
    s = 2.0 * math.sin(0.5 * min(w, math.pi))
    return s * s


# Above this many merged ranges the OR-of-BETWEEN predicate stops paying
# (plan bloat beats row-group pruning); the broadcast equi-join still
# filters correctly without it.
_MAX_PUSHED_RANGES = 256


def _merged_biased_ranges(cells: np.ndarray) -> list[tuple[int, int]]:
    """Biased [lo, hi] leaf ranges of the candidate cells, with adjacent
    /overlapping ranges coalesced (cells of one attempt share a level, so
    ranges are disjoint but frequently adjacent along the Hilbert curve)."""
    cells = np.unique(cells.astype(np.uint64))
    lo = k.bias_u64(k.range_min(cells)).astype(np.int64)
    hi = k.bias_u64(k.range_max(cells)).astype(np.int64)
    order = np.argsort(lo)
    merged: list[tuple[int, int]] = []
    for l, h in zip(lo[order], hi[order]):
        if merged and int(l) <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], int(h)))
        else:
            merged.append((int(l), int(h)))
    return merged


def _pushdown_candidate_ranges(
    df: DataFrame, cand: list[np.ndarray], lvl: int, biased_col: str
) -> DataFrame:
    """Restrict the attempt's scan to the candidate rings' leaf ranges.

    The OR-of-BETWEEN on the biased column is a top-level conjunct, so it
    reaches the parquet scan (PushedFilters → row-group min/max pruning on
    the Hilbert-sorted table). Semantics-preserving: every row that can
    match the ring equi-join lies inside its candidate cell's leaf range.
    """
    if biased_col not in df.columns or lvl <= 0:
        return df
    ranges = _merged_biased_ranges(np.concatenate(cand))
    if len(ranges) > _MAX_PUSHED_RANGES:
        return df
    pred = F.lit(False)
    for lo, hi in ranges:
        pred = pred | F.col(biased_col).between(F.lit(lo), F.lit(hi))
    return df.where(pred)


def knn_join(
    spark: SparkSession,
    df: DataFrame,
    query_points: list[tuple[int, float, float]],
    kk: int,
    radius_guess_deg: float = 1.0,
    lat_col: str = "lat",
    lng_col: str = "lng",
    id_col: str = "image_id",
    max_widen: int = 12,
    biased_col: str = "cell_id_biased",
) -> DataFrame:
    """(query_id, rank, image_id, dist_chord2) of the exact k nearest
    rows per query point. Deterministic tie-break on id.

    When ``biased_col`` exists on ``df``, each widening attempt pushes the
    candidate rings' merged leaf ranges as an OR-of-BETWEEN top-level
    conjunct, so the attempt reads only matching row groups of the
    Hilbert-sorted table (PushedFilters) instead of rescanning it.

    The returned DataFrame is eagerly materialized (localCheckpoint) —
    at most ``len(query_points) * kk`` rows — so no intermediate caches
    stay pinned in executor memory after the call returns.
    """
    if not query_points:
        return df.select(
            F.lit(0).cast("long").alias("query_id"),
            F.lit(0).cast("int").alias("rank"),
            F.col(id_col),
            F.lit(0.0).alias("dist_chord2"),
        ).limit(0)
    qids = np.array([q[0] for q in query_points], dtype=np.int64)
    qlat = np.array([q[1] for q in query_points], dtype=np.float64)
    qlng = np.array([q[2] for q in query_points], dtype=np.float64)

    level = metrics.MIN_WIDTH.max_level(math.radians(radius_guess_deg))
    level = max(0, min(30, level))

    # Distributed assembly: ranked rows never leave the executors. Per
    # widening attempt the driver collects ONE aggregate row per pending
    # query (n found, k-th distance) — the same cardinality as the
    # query_points list the caller already holds — decides which queries
    # are resolved, and keeps the resolved slice as a persisted DataFrame.
    # The returned result is the lazy union of those slices.
    resolved: DataFrame | None = None
    persisted: list[DataFrame] = []
    pending = np.arange(len(qids))
    attempt = 0
    while len(pending) > 0:
        lvl = max(0, level - 2 * attempt)
        cand = _candidate_cells(qlat[pending], qlng[pending], lvl)
        rows = []
        for i, cells in zip(pending, cand):
            for c in cells.view(np.int64):
                rows.append((int(qids[i]), float(qlat[i]), float(qlng[i]), int(c)))
        cand_df = spark.createDataFrame(
            rows, "query_id long, qlat double, qlng double, cand_cell long"
        )
        qx, qy, qz = xyz_cols("qlat", "qlng")
        px, py, pz = xyz_cols(lat_col, lng_col)
        src = _pushdown_candidate_ranges(df, cand, lvl, biased_col)
        j = src.withColumn("__pcell", s2_parent("cell_id", lvl)).join(
            F.broadcast(cand_df), F.col("__pcell") == F.col("cand_cell"), "inner"
        )
        scored = j.withColumn("dist_chord2", chord2_expr(px, py, pz, qx, qy, qz))
        w = Window.partitionBy("query_id").orderBy(
            F.col("dist_chord2").asc(), F.col(id_col).asc()
        )
        ranked = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= kk)
            .select("query_id", "rank", id_col, "dist_chord2")
            .persist()
        )
        persisted.append(ranked)
        # a query is final when it found k results AND the k-th distance
        # is inside the ring's guaranteed coverage radius
        safe = _safe_chord2(lvl)
        is_last = lvl == 0 or attempt >= max_widen
        if is_last:
            done_ids = {int(q) for q in qids[pending]}
        else:
            stats = ranked.groupBy("query_id").agg(
                F.count("*").alias("n"), F.max("dist_chord2").alias("dmax")
            ).collect()  # ≤ |pending| rows — bounded by the driver-side query list
            done_ids = {
                int(r["query_id"])
                for r in stats
                if r["n"] >= kk and r["dmax"] <= safe
            }
        if done_ids:
            done_df = spark.createDataFrame(
                [(q,) for q in sorted(done_ids)], "query_id long"
            )
            slice_df = ranked.join(F.broadcast(done_df), "query_id", "left_semi")
            resolved = slice_df if resolved is None else resolved.unionByName(slice_df)
        pending = pending[[int(q) not in done_ids for q in qids[pending]]]
        attempt += 1
    assert resolved is not None
    out = resolved.select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        id_col,
        "dist_chord2",
    ).localCheckpoint(eager=True)  # ≤ |queries|·k rows, frees the caches below
    for p in persisted:
        p.unpersist()
    return out
