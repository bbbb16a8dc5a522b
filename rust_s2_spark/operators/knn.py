"""kNN join: k nearest images per query point (SURVEY.md §2.8).

Plan (Spark-first, no per-row Python):
1. Driver-side: pick a seed cell level from the expected neighbor
   radius (MIN_WIDTH metric), compute each query's candidate ring =
   its cell + all_neighbors at that level (tiny, per query).
2. Broadcast-join the exploded (query_id, candidate_cell) table
   against the fact table on parent-at-level equality (native bit
   arithmetic — equi-join, broadcastable).
3. chord² distance (native SQL) + window rank ≤ k.
4. Queries that under-fill (ring too small) are retried with a wider
   ring, driver-side — each retry touches only the missing queries.

At scale the equi-join on the parent column co-locates with the
table's cell_id partitioning, so only the (small) candidate side
moves.
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
    """Per-query candidate cells: own cell + all neighbors at level."""
    ids = k.parent(k.cell_from_latlng(lat, lng), level)
    rings = k.all_neighbors(ids, level)
    return [
        np.unique(np.concatenate([[ids[i]], rings[i]])).astype(np.uint64)
        for i in range(len(ids))
    ]


def knn_join(
    spark: SparkSession,
    df: DataFrame,
    query_points: list[tuple[int, float, float]],
    kk: int,
    radius_guess_deg: float = 1.0,
    lat_col: str = "lat",
    lng_col: str = "lng",
    id_col: str = "image_id",
    max_widen: int = 3,
) -> DataFrame:
    """Return (query_id, rank, image_id, dist_chord2) of the k nearest
    rows per query point. Deterministic tie-break on id."""
    qids = np.array([q[0] for q in query_points], dtype=np.int64)
    qlat = np.array([q[1] for q in query_points], dtype=np.float64)
    qlng = np.array([q[2] for q in query_points], dtype=np.float64)

    level = metrics.MIN_WIDTH.max_level(math.radians(radius_guess_deg))
    level = max(0, min(30, level))

    result = None
    pending = np.arange(len(qids))
    for attempt in range(max_widen + 1):
        lvl = max(0, level - attempt)
        cand = _candidate_cells(qlat[pending], qlng[pending], lvl)
        rows = []
        for i, cells in zip(pending, cand):
            for c in cells.view(np.int64):  # two's-complement LongType view
                rows.append((int(qids[i]), float(qlat[i]), float(qlng[i]), int(c)))
        cand_df = spark.createDataFrame(
            rows, "query_id long, qlat double, qlng double, cand_cell long"
        )
        qx, qy, qz = xyz_cols("qlat", "qlng")
        px, py, pz = xyz_cols(lat_col, lng_col)
        j = df.withColumn("__pcell", s2_parent("cell_id", lvl)).join(
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
        )
        counts = {
            r["query_id"]: r["n"]
            for r in ranked.groupBy("query_id").agg(F.count("*").alias("n")).collect()
        }
        filled = np.array([counts.get(int(q), 0) >= kk for q in qids[pending]])
        done_idx = pending[filled]
        done_set = set(int(qids[i]) for i in done_idx)
        part = ranked.where(F.col("query_id").isin([int(q) for q in done_set]) if done_set else F.lit(False))
        result = part if result is None else result.unionByName(part)
        pending = pending[~filled]
        if len(pending) == 0:
            break
    if len(pending) > 0:
        # final attempt: take whatever the widest ring found
        last = ranked.where(
            F.col("query_id").isin([int(qids[i]) for i in pending])
        )
        result = last if result is None else result.unionByName(last)
    return result
