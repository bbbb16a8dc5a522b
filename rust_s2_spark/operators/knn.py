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
import pandas as pd
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


# --------------------------------------------------------------------------
# DataFrame-native query side: the probe set is itself a (possibly huge)
# DataFrame — millions of rows — so NOTHING per-query may touch the
# driver. Ring explode happens executor-side (s2_all_neighbors pandas
# UDF over the vectorized kernel), the parent equi-join co-locates with
# the fact table's cell partitioning, and widening retries only the
# unresolved probes via a left_anti join on the resolved-id set. The
# only driver-side values per round are two scalars (pending count /
# round index); reference parity: same exactness contract as knn_join
# (point_index.rs kNN semantics), different orchestration shape.


def _attempt_ranked_df(
    df: DataFrame,
    pending: DataFrame,
    lvl: int,
    kk: int,
    lat_col: str,
    lng_col: str,
    id_col: str,
    query_id_col: str,
    qlat_col: str,
    qlng_col: str,
) -> DataFrame:
    """One widening attempt, fully relational: explode each pending
    probe's candidate ring (own cell + 3×3 neighbors at ``lvl``; all six
    faces at level 0), equi-join the fact table on parent-at-lvl, score
    chord², keep window rank ≤ kk. Exposed standalone so the plan test
    can pin that the probe side is a real scan (no LocalTableScan /
    driver materialization)."""
    from ..functions import s2_all_neighbors, s2_cell_from_latlng

    if lvl <= 0:
        faces = k.from_face(np.arange(6, dtype=np.uint64)).view(np.int64)
        ring = F.array(*[F.lit(int(c)) for c in faces])
    else:
        qparent = s2_parent(
            s2_cell_from_latlng(F.col(qlat_col), F.col(qlng_col)), lvl
        )
        ring = F.array_union(
            F.array(qparent), s2_all_neighbors(qparent, lvl)
        )
    cand = pending.select(
        query_id_col, qlat_col, qlng_col, F.explode(ring).alias("__cand_cell")
    )
    qx, qy, qz = xyz_cols(qlat_col, qlng_col)
    px, py, pz = xyz_cols(lat_col, lng_col)
    j = df.withColumn("__pcell", s2_parent("cell_id", lvl)).join(
        cand, F.col("__pcell") == F.col("__cand_cell"), "inner"
    )
    scored = j.withColumn("dist_chord2", chord2_expr(px, py, pz, qx, qy, qz))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist_chord2").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= kk)
        .select(query_id_col, "rank", id_col, "dist_chord2")
    )


def _ring_cells_np(
    lat: np.ndarray, lng: np.ndarray, lvls: np.ndarray
) -> list[np.ndarray]:
    """Per-row candidate ring at a PER-ROW level: own cell + all
    neighbors at lvls[i] (the six face cells at level 0 — the 3×3 ring
    only reaches 5 of the 6 faces there). numpy in, int64 arrays out;
    shared by the executor-side probe-prep UDF and the driver-side
    literal tail rounds so the two paths cannot drift."""
    leafs = k.cell_from_latlng(
        np.asarray(lat, dtype=np.float64), np.asarray(lng, dtype=np.float64)
    )
    lvls = np.asarray(lvls, dtype=np.int64)
    out: list[np.ndarray] = [None] * len(leafs)  # type: ignore[list-item]
    faces = k.from_face(np.arange(6, dtype=np.uint64)).view(np.int64)
    for lv in np.unique(lvls):
        idx = np.nonzero(lvls == lv)[0]
        if lv <= 0:
            for i in idx:
                out[i] = faces
        else:
            p = k.parent(leafs[idx], int(lv))
            rings = k.all_neighbors(p, int(lv))
            pv = p.view(np.int64)
            for n, i in enumerate(idx):
                out[i] = np.unique(
                    np.concatenate([pv[n : n + 1], rings[n].view(np.int64)])
                )
    return out


# Tail rounds with at most this many pending probes run the driver-
# literal path (rings computed in numpy, candidate frame broadcast,
# fact scan pruned via the merged-range pushdown) instead of another
# relational pass over the full probe pipeline.
_TAIL_COLLECT_MAX = 2048
_WIDEN_STEP = 2
_LOG4 = math.log(4.0)


def _start_level_np(
    own_det: np.ndarray,
    s_det: np.ndarray,
    own_coarse: np.ndarray,
    s_coarse: np.ndarray,
    target: int,
):
    """Per-probe start level from local densities: own_* = the probe's
    own-cell row count, s_* = its 3×3 ring sum, at level 7 (det) and
    its level-4 rollup (coarse). Picks the finest level whose ring
    still expects >= target rows. The effective density uses
    max(9·own, ring_sum): real corpora concentrate (a city is a
    Gaussian spot inside ONE level-7 cell, 10-100× the ring average),
    and under-estimating density by 16× makes every city probe join a
    ~64×-target ring — the measured 62M-candidate blowup this term
    removes. Pure performance: any level is exact under the widening
    contract."""
    t = float(max(1, target))
    r7 = np.maximum(np.maximum(9.0 * own_det, s_det).astype(np.float64), 1.0)
    r4 = np.maximum(np.maximum(9.0 * own_coarse, s_coarse).astype(np.float64), 1.0)
    s4 = np.maximum(s_coarse.astype(np.float64), 1.0)
    lvl = np.where(
        s_det >= t,
        7 + np.floor(np.log(r7 / t) / _LOG4),
        np.where(
            s_coarse >= t,
            np.minimum(6, 4 + np.floor(np.log(r4 / t) / _LOG4)),
            np.maximum(0, 4 + np.floor(np.log(s4 / t) / _LOG4)),
        ),
    )
    return np.clip(lvl, 0, 30).astype(np.int64)


def _probe_prep_udf(cells7: np.ndarray, n7: np.ndarray, target: int):
    """pandas UDF (qlat, qlng) → struct(jl int, ring array<long>): the
    density-derived start level plus the round-0 candidate ring, ONE
    Python crossing per probe batch. The bounded level-7 histogram
    (≤ 6·4^7 cells regardless of corpus size) rides in the closure as
    sorted numpy arrays; its level-4 rollup is derived here once."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    order = np.argsort(cells7)
    c7s = cells7[order]
    n7s = n7[order].astype(np.int64)
    p4 = k.parent(c7s, 4)
    c4s, inv = np.unique(p4, return_inverse=True)
    n4s = np.zeros(len(c4s), dtype=np.int64)
    np.add.at(n4s, inv, n7s)

    def _lookup(cells: np.ndarray, tc: np.ndarray, tn: np.ndarray) -> np.ndarray:
        if len(tc) == 0:
            return np.zeros(len(cells), dtype=np.int64)
        pos = np.clip(np.searchsorted(tc, cells), 0, len(tc) - 1)
        return np.where(tc[pos] == cells, tn[pos], 0)

    def _ring_density(leafs: np.ndarray, lvl: int, tc, tn):
        """(own-cell count, 3×3 ring sum incl. own) per row."""
        p = k.parent(leafs, lvl)
        rings = k.all_neighbors(p, lvl)
        lens = np.fromiter((len(r) for r in rings), dtype=np.int64, count=len(rings))
        flat = np.concatenate(rings) if len(rings) else np.array([], dtype=np.uint64)
        vals = _lookup(flat, tc, tn)
        offs = np.zeros(len(rings), dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        ringsum = (
            np.add.reduceat(vals, offs)
            if len(flat)
            else np.zeros(len(rings), dtype=np.int64)
        )
        ringsum = np.where(lens > 0, ringsum, 0)
        own = _lookup(p, tc, tn)
        return own, ringsum + own

    schema = StructType(
        [
            StructField("jl", IntegerType()),
            StructField("ring", ArrayType(LongType())),
        ]
    )

    @pandas_udf(schema)
    def _prep(qlat: pd.Series, qlng: pd.Series) -> pd.DataFrame:
        lat = qlat.to_numpy(np.float64)
        lng = qlng.to_numpy(np.float64)
        leafs = k.cell_from_latlng(lat, lng)
        o7, s7 = _ring_density(leafs, 7, c7s, n7s)
        o4, s4 = _ring_density(leafs, 4, c4s, n4s)
        jl = _start_level_np(o7, s7, o4, s4, target)
        rings = _ring_cells_np(lat, lng, jl)
        return pd.DataFrame({"jl": jl.astype(np.int32), "ring": rings})

    return _prep


def _attempt_var(
    df: DataFrame,
    cand: DataFrame,
    kk: int,
    active: "list[int] | DataFrame",
    lat_col: str,
    lng_col: str,
    id_col: str,
    query_id_col: str,
    qlat_col: str,
    qlng_col: str,
) -> DataFrame:
    """One widening attempt over probes carrying per-row ring levels:
    ``cand`` = (query_id, qlat, qlng, __jl, __tc) with __tc the ring
    cells at each probe's own level. The fact side is scanned ONCE and
    explodes to its ancestors at exactly the ``active`` levels (cell
    ids encode their level, so the single-column equi-join can never
    match across levels). Scoring + window rank as before, plus the
    resolution flags computed IN the same window pass (no extra
    shuffle): __n = candidate count, __kd = k-th distance, __ok =
    resolved under the _safe_chord2 coverage contract (level-0 probes
    are always final — their ring is the whole sphere)."""
    if isinstance(active, DataFrame):
        # lazy level set (a ≤31-row distinct over the probe side,
        # broadcast): the fact side explodes to one ancestor per active
        # level WITHOUT the driver ever collecting the set — one fewer
        # job per call than the literal-list form the tail rounds use
        facts = df.crossJoin(F.broadcast(active)).select(
            id_col, lat_col, lng_col,
            s2_parent("cell_id", F.col("__lvl")).alias("__pc"),
        )
    elif len(active) == 1:
        facts = df.select(
            id_col, lat_col, lng_col,
            s2_parent("cell_id", active[0]).alias("__pc"),
        )
    else:
        facts = df.select(
            id_col, lat_col, lng_col,
            F.explode(
                F.array(*[s2_parent("cell_id", lv) for lv in active])
            ).alias("__pc"),
        )
    j = facts.join(cand, F.col("__pc") == F.col("__tc"), "inner")
    qx, qy, qz = xyz_cols(qlat_col, qlng_col)
    px, py, pz = xyz_cols(lat_col, lng_col)
    scored = j.withColumn("dist_chord2", chord2_expr(px, py, pz, qx, qy, qz))
    # partitioned by (probe, attempted level): in the relational rounds
    # each probe carries ONE level so this equals partitioning by probe;
    # the literal tail attempts TWO levels per probe in one pass and
    # resolves each class independently (any resolved class holds the
    # exact top-k, so classes are interchangeable on success)
    w_rank = Window.partitionBy(query_id_col, "__jl").orderBy(
        F.col("dist_chord2").asc(), F.col(id_col).asc()
    )
    w_all = Window.partitionBy(query_id_col, "__jl")
    safe_arr = F.array(*[F.lit(_safe_chord2(lv)) for lv in range(31)])
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .withColumn("__n", F.count("*").over(w_all))
        .withColumn(
            "__kd",
            F.max(F.when(F.col("rank") <= kk, F.col("dist_chord2"))).over(w_all),
        )
        .where(F.col("rank") <= kk)
        .withColumn(
            "__ok",
            (F.col("__jl") == 0)
            | (
                (F.col("__n") >= kk)
                & (F.col("__kd") <= F.element_at(safe_arr, F.col("__jl") + 1))
            ),
        )
        .select(
            query_id_col, "__jl", "rank", id_col, "dist_chord2",
            "__ok", "__n", "__kd",
        )
    )


def knn_join_df(
    df: DataFrame,
    queries: DataFrame,
    kk: int,
    radius_guess_deg: float = 1.0,
    lat_col: str = "lat",
    lng_col: str = "lng",
    id_col: str = "image_id",
    query_id_col: str = "query_id",
    qlat_col: str = "qlat",
    qlng_col: str = "qlng",
    max_widen: int = 12,
    stats: DataFrame | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """(query_id, rank, image_id, dist_chord2) of the exact k nearest
    fact rows per probe ROW of ``queries`` — the large-probe-set twin of
    ``knn_join``. Deterministic tie-break on id.

    PRECONDITION: ``query_id`` is unique per probe row (as in
    ``knn_join``'s list contract). Duplicate ids merge both probes'
    candidate pools under one rank window and produce interleaved
    wrong ranks — deduplicate or re-key the probe frame first.

    ``stats``: precomputed density statistics from
    ``plans.stats.build_cell_stats(df, levels=(7,))`` (table metadata,
    maintained at write time next to the lineage table). When given,
    the bounded level-7 histogram below is read from this frame
    instead of re-scanning the fact table — on a REPEATED kNN
    workload at 100 TB the stats scan is paid once per dataset, not
    once per query. Start levels are pure performance (the resolution
    contract makes any choice exact), so stale stats can only slow a
    query down, never change its result.

    ``n_rows``: the caller's known row count of ``df`` (from
    ``df.count()``, the lineage table's write metrics, or
    ``plans.stats.stats_row_count``). When BOTH ``stats`` and
    ``n_rows`` are given, the stats' implied corpus size (Σn at the
    detection level — every row has exactly one ancestor there) is
    checked against it: a ≥2× mismatch RAISES, a >25% drift WARNS.
    This guards the measured footgun of seeding a subset corpus with
    full-table stats (identical result, 2.7× slower in the round-8
    bench): stats describing the wrong corpus start probes at the
    wrong density and the cost hides in extra widening rounds, so it
    is caught here, at injection, where the fix is obvious.

    Exactness: identical widening contract to ``knn_join`` — a probe is
    final only when it holds ≥ k results whose k-th distance fits inside
    the ring's guaranteed coverage (_safe_chord2); otherwise the ring
    coarsens by three levels and ONLY unresolved probes retry. Level 0
    covers the sphere, so termination is unconditional.

    Start levels (round-10 rework; pure performance, exactness is
    level-independent): each probe derives its OWN start level from the
    local density around it — the bounded level-7 histogram (≤ 6·4^7
    cells whatever the corpus size) rides into one pandas UDF as sorted
    numpy arrays, and per probe the 3×3 ring sums at level 7 and at its
    level-4 rollup pick the finest level whose ring still expects
    ≥ 8k rows (rounded down to the even grid so the fact side explodes
    to a handful of distinct levels). The previous two-class scheme
    (global-average level + one hot-cell level) started sparse probes
    far too fine — the global average is dominated by the cities — and
    burned 3-4 full-table widening rounds per call; per-probe levels
    resolve almost every probe in round 1. The ``radius_guess_deg``
    fineness floor is gone for the same reason: local density evidence
    beats the caller's guess, and a too-fine floor only adds rounds.

    Scale shape: round 1 is ONE scan of the fact side (exploded to its
    ancestors at exactly the active levels — cell ids encode their
    level so one equi-join column suffices), one shuffle join, one
    window pass that also computes the resolution flags (no separate
    aggregation shuffle). Unresolved tails ≤ 2048 probes switch to the
    driver-literal path: rings in numpy, a broadcast candidate frame,
    and the merged-range OR-of-BETWEEN pushdown pruning the fact scan
    (knn_join's shape). Driver traffic = the bounded histogram up
    front, one ≤31-row level histogram per round, and the tail probes
    once they fit the literal threshold.
    """
    empty_out = df.select(
        F.lit(0).cast("long").alias(query_id_col),
        F.lit(0).cast("int").alias("rank"),
        F.col(id_col),
        F.lit(0.0).alias("dist_chord2"),
    ).limit(0)
    L_DET = 7
    target = 8 * kk
    # repeated-workload memo (streaming batches, repeat calls with one
    # injected stats frame — or repeat calls against one fact frame):
    # the bounded histogram is collected ONCE per source DataFrame
    # object and memoized on it. DataFrames are immutable plans, so
    # the capture only goes stale if the underlying FILES are
    # rewritten under a live frame — and even then start levels are
    # pure performance, never correctness.
    src = stats if stats is not None else df
    cached = getattr(src, "_s2_l7_hist", None)
    if cached is not None:
        cells7, n7 = cached
    elif stats is None:
        hist_rows = (
            df.groupBy(s2_parent("cell_id", L_DET).alias("__p"))
            .count()
            .collect()
        )  # bounded: ≤ 6·4^7 = 98,304 rows whatever |df| is
        cells7 = np.array([r["__p"] for r in hist_rows], dtype=np.int64).view(
            np.uint64
        )
        n7 = np.array([r["count"] for r in hist_rows], dtype=np.int64)
        df._s2_l7_hist = (cells7, n7)
    else:
        hist_rows = (
            stats.where(F.col("level") == F.lit(L_DET))
            .select(F.col("cell").alias("__p"), F.col("n").alias("count"))
            .collect()
        )  # bounded the same way — the stats table's own bound
        cells7 = np.array([r["__p"] for r in hist_rows], dtype=np.int64).view(
            np.uint64
        )
        n7 = np.array([r["count"] for r in hist_rows], dtype=np.int64)
        stats._s2_l7_hist = (cells7, n7)
    n_tot = int(n7.sum()) if len(n7) else 0
    if stats is not None and n_tot == 0:
        # empty stats — including an entirely empty frame — can never
        # seed start levels; raising the build hint here beats the
        # misleading wrong-corpus error the n_rows check would give
        # (round-9 ADVICE) and beats silently returning no neighbors
        raise ValueError(
            f"stats carry no level={L_DET} rows; build with "
            f"build_cell_stats(df, levels=({L_DET},))"
        )
    if stats is not None and n_rows is not None and n_rows > 0:
        ratio = n_tot / n_rows
        if ratio >= 2.0 or ratio <= 0.5:
            raise ValueError(
                f"injected stats describe a corpus of {n_tot} rows but "
                f"n_rows={n_rows} — wrong corpus (subset/superset?). "
                f"Rebuild with build_cell_stats over THIS frame; a "
                f"mismatch this gross cost 2.7x in widening rounds when "
                f"measured."
            )
        if abs(ratio - 1.0) > 0.25:
            import warnings

            warnings.warn(
                f"injected stats imply {n_tot} rows vs n_rows={n_rows} "
                f"({ratio:.2f}x) — stale stats only slow queries down, "
                f"but consider rebuilding",
                stacklevel=2,
            )
    if n_tot == 0:
        # empty fact table: the exact k-nearest result is empty for
        # every probe — no join round can produce a row
        return empty_out

    spark = df.sparkSession
    # the prep UDF closure carries the histogram (~MBs at full level-7
    # occupancy) — reuse the constructed UDF across repeat calls with
    # the same source frame and k instead of re-pickling per call
    prep_cache = getattr(src, "_s2_prep_udfs", None)
    if prep_cache is None:
        prep_cache = {}
        src._s2_prep_udfs = prep_cache
    prep = prep_cache.get(target)
    if prep is None:
        prep = _probe_prep_udf(cells7, n7, target)
        prep_cache[target] = prep
    base = queries.select(
        query_id_col, qlat_col, qlng_col
    ).withColumn("__p", prep(F.col(qlat_col), F.col(qlng_col)))
    pending = base.select(
        query_id_col, qlat_col, qlng_col,
        F.col("__p.jl").alias("__jl"),
        F.col("__p.ring").alias("__ring"),
    ).persist()
    # (an all-literal shortcut for small probe sets was benchmarked
    # 1.5× SLOWER than the relational round at streaming batch sizes:
    # scattered rings defeat the range pushdown and per-round driver
    # orchestration beats the saving)
    sel = [query_id_col, "rank", id_col, "dist_chord2"]
    persisted: list[DataFrame] = [pending]
    slices: list[DataFrame] = []
    attempt = 0
    # round 0 never collects the level set: the fact side derives it
    # relationally (broadcast distinct over the probe side) — one
    # fewer driver action per call; later rounds know it from the
    # round counts
    active: list[int] | None = None
    while True:
        cand = pending.select(
            query_id_col, qlat_col, qlng_col, "__jl",
            F.explode("__ring").alias("__tc"),
        )
        lv_arg = (
            pending.select(F.col("__jl").alias("__lvl")).distinct()
            if active is None
            else active
        )
        ranked = _attempt_var(
            df, cand, kk, lv_arg,
            lat_col, lng_col, id_col, query_id_col, qlat_col, qlng_col,
        ).persist()
        persisted.append(ranked)
        if (
            active is not None and all(lv == 0 for lv in active)
        ) or attempt >= max_widen:
            slices.append(ranked.select(*sel))
            break
        slices.append(ranked.where(F.col("__ok")).select(*sel))
        # kd-DERIVED widening: a probe that found >= k rows but whose
        # k-th distance exceeds the ring's coverage retries at the
        # finest level whose one-ring contract covers that distance —
        # the new ring provably holds every point within kd, and the
        # new k-th can only shrink, so that retry RESOLVES by
        # construction (one extra round, never a widening walk).
        # Probes with < k rows are in genuinely sparse territory and
        # jump 4 levels (256× ring area) instead. ONE aggregation
        # serves both the resolved-id set and the kd lookup.
        from .covering_join import radius_level_expr

        pstats = ranked.groupBy(query_id_col).agg(
            F.max("__ok").alias("__pok"),
            F.max("__n").alias("__pn"),
            F.max("__kd").alias("__pkd"),
        )
        nxt = (
            pending.where(F.col("__jl") > 0)
            .join(pstats, query_id_col, "left")
            .where(~F.coalesce(F.col("__pok"), F.lit(False)))
            .withColumn(
                "__jl",
                F.when(
                    F.col("__pn") >= kk,
                    F.greatest(
                        F.lit(0),
                        F.least(
                            F.col("__jl") - 1,
                            radius_level_expr(F.col("__pkd")),
                        ),
                    ),
                ).otherwise(F.greatest(F.lit(0), F.col("__jl") - F.lit(4))),
            )
            # a kd-derived retry RESOLVES by construction (the ring
            # provably covers the previous k-th distance) — carry the
            # flag so the next round can skip its resolve-check job
            .withColumn(
                "__gtd",
                (F.coalesce(F.col("__pn"), F.lit(0)) >= kk)
                & F.col("__pkd").isNotNull(),
            )
            .drop("__pok", "__pn", "__pkd")
        ).persist()
        persisted.append(nxt)
        # THE round action: ≤ 31 rows to the driver (level histogram of
        # the unresolved tail); materializes this round's pipeline
        counts = nxt.groupBy("__jl").agg(
            F.count("*").alias("count"),
            F.min(F.col("__gtd").cast("int")).alias("g"),
        ).collect()
        if not counts:
            break
        n_pend = sum(int(r["count"]) for r in counts)
        active = sorted(int(r["__jl"]) for r in counts)
        all_gtd = all(int(r["g"]) == 1 for r in counts)
        attempt += 1
        if n_pend <= _TAIL_COLLECT_MAX:
            rows = nxt.select(
                query_id_col, qlat_col, qlng_col, "__jl", "__gtd"
            ).collect()
            slices.extend(
                _tail_literal_rounds(
                    spark, df, rows, kk, attempt, max_widen, persisted,
                    lat_col, lng_col, id_col,
                    query_id_col, qlat_col, qlng_col,
                    queries.schema[query_id_col].dataType,
                    cells7, n7,
                )
            )
            break
        pending = nxt.drop("__ring").withColumn(
            "__ring", _ring_var_udf(F.col(qlat_col), F.col(qlng_col), F.col("__jl"))
        )
        if all_gtd:
            # every remaining probe retries at its kd-derived level —
            # the round is final by construction: emit and stop
            cand = pending.select(
                query_id_col, qlat_col, qlng_col, "__jl",
                F.explode("__ring").alias("__tc"),
            )
            slices.append(
                _attempt_var(
                    df, cand, kk, active,
                    lat_col, lng_col, id_col,
                    query_id_col, qlat_col, qlng_col,
                ).select(*sel)
            )
            break
    out = slices[0] if len(slices) == 1 else _union_all(slices)
    out = out.select(
        query_id_col,
        F.col("rank").cast("int").alias("rank"),
        id_col,
        "dist_chord2",
    ).localCheckpoint(eager=True)  # ≤ |probes|·k rows; frees the caches below
    for p in persisted:
        p.unpersist()
    return out


def _union_all(frames: list[DataFrame]) -> DataFrame:
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _ring_var_udf(qlat, qlng, jl):
    """Executor-side per-row-level ring (relational big-tail retries)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(ArrayType(LongType()))
    def _ring(lat: pd.Series, lng: pd.Series, lv: pd.Series) -> pd.Series:
        return pd.Series(
            _ring_cells_np(
                lat.to_numpy(np.float64),
                lng.to_numpy(np.float64),
                lv.to_numpy(np.int64),
            )
        )

    return _ring(qlat, qlng, jl)


def _tail_literal_rounds(
    spark: SparkSession,
    df: DataFrame,
    rows: list,
    kk: int,
    attempt0: int,
    max_widen: int,
    persisted: list[DataFrame],
    lat_col: str,
    lng_col: str,
    id_col: str,
    query_id_col: str,
    qlat_col: str,
    qlng_col: str,
    qid_type,
    cells7: np.ndarray,
    n7: np.ndarray,
) -> list[DataFrame]:
    """Driver-literal widening for small unresolved tails (≤
    _TAIL_COLLECT_MAX probes): rings computed in numpy, the candidate
    frame broadcast, and the fact scan pruned with the merged-range
    OR-of-BETWEEN pushdown (knn_join's shape — at 100 TB a tail round
    reads only the row groups its rings cover instead of rescanning
    the table). Same ring/coverage contract as the relational rounds,
    so results are identical; returns the accepted rank slices."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    qids = [r[0] for r in rows]
    qlat = np.array([r[1] for r in rows], dtype=np.float64)
    qlng = np.array([r[2] for r in rows], dtype=np.float64)
    jl = np.array([r[3] for r in rows], dtype=np.int64)
    gtd = np.array([bool(r[4]) for r in rows])
    cand_schema = StructType(
        [
            StructField(query_id_col, qid_type),
            StructField(qlat_col, DoubleType()),
            StructField(qlng_col, DoubleType()),
            StructField("__jl", IntegerType()),
            StructField("__tc", LongType()),
        ]
    )
    safe_np = np.array([_safe_chord2(lv) for lv in range(31)])
    # exact ring row counts from the level-7 histogram: a ring cell at
    # level <= 7 covers complete level-7 cells, so its row count is an
    # exact range sum over the sorted histogram (prefix sums +
    # searchsorted); used to pick the widened level for sparse probes
    # so the next ring PROVABLY holds >= target rows instead of
    # guessing a fixed jump
    order7 = np.argsort(cells7)
    c7sorted = cells7[order7]
    pref7 = np.concatenate([[0], np.cumsum(n7[order7].astype(np.int64))])

    def _exact_ring_rows(ring: np.ndarray) -> int:
        u = ring.view(np.uint64)
        lo = k.range_min(u)
        hi = k.range_max(u)
        a = np.searchsorted(c7sorted, lo, side="left")
        b = np.searchsorted(c7sorted, hi, side="right")
        return int((pref7[b] - pref7[a]).sum())

    def _sparse_next_level(lat: float, lng: float, cur: int, target: int) -> int:
        for lv in range(min(cur - 1, 7), -1, -1):
            ring = _ring_cells_np(
                np.array([lat]), np.array([lng]), np.array([lv])
            )[0]
            if _exact_ring_rows(ring) >= target:
                return lv
        return 0

    slices: list[DataFrame] = []
    sel = [query_id_col, "rank", id_col, "dist_chord2"]
    pend = np.arange(len(qids))
    attempt = attempt0
    while len(pend) > 0:
        lv = jl[pend]
        rings = _ring_cells_np(qlat[pend], qlng[pend], lv)
        cand_rows = [
            (qids[i], float(qlat[i]), float(qlng[i]), int(lv_i), int(c))
            for i, lv_i, ring in zip(pend, lv, rings)
            for c in ring
        ]
        cand_df = F.broadcast(spark.createDataFrame(cand_rows, cand_schema))
        active = sorted(int(x) for x in np.unique(lv))
        src = df
        if min(active) > 0 and "cell_id_biased" in df.columns:
            all_cells = np.concatenate(rings).view(np.uint64)
            ranges = _merged_biased_ranges(all_cells)
            if len(ranges) <= _MAX_PUSHED_RANGES:
                pred = F.lit(False)
                for lo, hi in ranges:
                    pred = pred | F.col("cell_id_biased").between(
                        F.lit(lo), F.lit(hi)
                    )
                src = df.where(pred)
        ranked = _attempt_var(
            src, cand_df, kk, active,
            lat_col, lng_col, id_col, query_id_col, qlat_col, qlng_col,
        )
        if (
            bool(np.all(gtd[pend]))
            or attempt >= max_widen
            or all(x == 0 for x in active)
        ):
            # kd-derived levels resolve by construction (the ring
            # provably covers each probe's previous k-th distance), so
            # an all-guaranteed round needs no resolve-check job: emit
            # lazily and let the final checkpoint materialize it once
            slices.append(ranked.select(*sel))
            break
        ranked = ranked.persist()
        persisted.append(ranked)
        slices.append(ranked.where(F.col("__ok")).select(*sel))
        flags = ranked.select(
            query_id_col, "__ok", "__n", "__kd"
        ).distinct().collect()
        info = {r[0]: (bool(r[1]), int(r[2]), r[3]) for r in flags}
        nxt_pend = []
        for i in pend:
            got = info.get(qids[i])
            if (got is not None and got[0]) or jl[i] <= 0:
                continue  # resolved, or level-0 best-effort already out
            nxt_pend.append(i)
            if got is not None and got[1] >= kk and got[2] is not None:
                # kd-derived level: finest ring that covers the k-th
                # distance — resolves next round by construction
                jl[i] = min(
                    jl[i] - 1, max(0, int(np.sum(safe_np >= got[2]) - 1))
                )
                gtd[i] = True
            else:
                # sparse probe: pick the finest level whose ring holds
                # >= target rows FOR REAL (exact histogram range sums)
                jl[i] = _sparse_next_level(
                    float(qlat[i]), float(qlng[i]), int(jl[i]), 8 * kk
                )
                gtd[i] = False
        pend = np.array(nxt_pend, dtype=np.int64)
        attempt += 1
    return slices


def mutual_knn_pairs(
    df: DataFrame,
    kk: int,
    radius_guess_deg: float = 1.0,
    lat_col: str = "lat",
    lng_col: str = "lng",
    id_col: str = "image_id",
    stats: DataFrame | None = None,
    **kwargs,
) -> DataFrame:
    """Mutual-kNN graph edges (a, b) with a < b: b is one of a's ``kk``
    nearest OTHER rows AND a is one of b's — the standard symmetric
    kNN-graph used for density-based clustering and near-dup grouping
    (mutual edges reject the hub/chain links a one-directional kNN
    graph draws into dense regions; feed the result to
    ``dedup.connected_components`` for clusters).

    Exact by composition: one ``knn_join_df`` self-join asks for
    ``kk+1`` neighbors (self rides along at distance 0 but may not be
    rank 1 — a co-located row with a smaller id outranks it under the
    deterministic tie-break), drops self, re-ranks, keeps ``kk``. The
    mutual step is then ONE equi-join of the n·k edge table with its
    swap — bounded by n·k rows, never n².
    """
    iid = F.col(id_col).cast("long")
    probes = df.select(
        iid.alias("query_id"),
        F.col(lat_col).alias("qlat"),
        F.col(lng_col).alias("qlng"),
    )
    nn = knn_join_df(
        df, probes, kk + 1,
        radius_guess_deg=radius_guess_deg,
        lat_col=lat_col, lng_col=lng_col, id_col=id_col,
        stats=stats, **kwargs,
    )
    others = nn.where(F.col(id_col).cast("long") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_chord2").asc(), F.col(id_col).asc()
    )
    edges = (
        others.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= kk)
        .select(
            F.col("query_id").alias("src"),
            F.col(id_col).cast("long").alias("dst"),
            "dist_chord2",
        )
    )
    fwd = edges.where(F.col("src") < F.col("dst"))
    rev = edges.where(F.col("src") > F.col("dst")).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return (
        fwd.join(rev, ["src", "dst"], "left_semi")
        .select(F.col("src").alias("a"), F.col("dst").alias("b"), "dist_chord2")
    )


def idw_interpolate(
    facts: DataFrame,
    probes: DataFrame,
    kk: int,
    value_col: str,
    radius_guess_deg: float = 1.0,
    lat_col: str = "lat",
    lng_col: str = "lng",
    id_col: str = "image_id",
    query_id_col: str = "query_id",
    qlat_col: str = "qlat",
    qlng_col: str = "qlng",
    stats: DataFrame | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Inverse-distance-weighted interpolation: for every probe row,
    estimate ``value_col`` from its ``kk`` nearest facts with weights
    1/chord² — the classic IDW spatial surface (power 2 over great-
    circle chord distance), computed exactly on top of ``knn_join_df``.

    Returns (query_id, est): est = Σ wᵢvᵢ / Σ wᵢ over the k nearest,
    except when a fact sits EXACTLY at the probe (chord² == 0): then
    est is that fact's value (min fact id wins among co-located facts —
    compared as LONG, like mutual_knn_pairs: a raw string id column
    would order "12" < "2"), the standard IDW exact-hit rule.

    Facts with a NULL ``value_col`` are dropped up front (they cannot
    contribute a weighted term): the estimate uses the k nearest
    facts WITH a value.

    Determinism across engines: both numerator and denominator are
    SEQUENTIAL folds in rank order (array_sort + F.aggregate — not a
    parallel SUM, whose float addition order is partition-dependent),
    so a relational oracle replaying list(x ORDER BY rank) +
    list_reduce reproduces the same IEEE double bit-for-bit.
    """
    facts = facts.where(F.col(value_col).isNotNull())
    nn = knn_join_df(
        facts, probes, kk,
        radius_guess_deg=radius_guess_deg,
        lat_col=lat_col, lng_col=lng_col, id_col=id_col,
        query_id_col=query_id_col, qlat_col=qlat_col, qlng_col=qlng_col,
        stats=stats, n_rows=n_rows,
    )
    vals = facts.select(
        F.col(id_col), F.col(value_col).cast("double").alias("__v")
    )
    j = nn.join(vals, id_col)
    # ANSI double division throws on zero — try_divide yields NULL for
    # chord² == 0 terms, poisoning that probe's fold to NULL, which the
    # exact-hit override then supplies (such a probe always has one).
    # The exact-hit rule (min fact id at chord² == 0) rides the SAME
    # aggregation as the fold (round-10): min over a (long id, value)
    # struct orders by id first, so no separate window pass or second
    # evaluation of the join subtree is needed — bit-identical output.
    w = F.try_divide(F.lit(1.0), F.col("dist_chord2"))
    terms = j.select(
        query_id_col,
        F.struct(
            F.col("rank").alias("r"),
            (w * F.col("__v")).alias("num"),
            w.alias("den"),
        ).alias("__t"),
        F.when(
            F.col("dist_chord2") == 0.0,
            F.struct(
                F.col(id_col).cast("long").alias("i"),
                F.col("__v").alias("v"),
            ),
        ).alias("__e"),
    )
    fold = terms.groupBy(query_id_col).agg(
        F.array_sort(F.collect_list("__t")).alias("__ts"),
        F.min("__e").alias("__em"),
    )
    return fold.select(
        query_id_col,
        F.coalesce(
            F.col("__em.v"),
            F.try_divide(
                F.aggregate("__ts", F.lit(0.0), lambda a, x: a + x["num"]),
                F.aggregate("__ts", F.lit(0.0), lambda a, x: a + x["den"]),
            ),
        ).alias("est"),
    )
