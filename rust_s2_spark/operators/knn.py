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
    the level-7 hot-cell aggregation below is read from this bounded
    frame instead of re-scanning the fact table — on a REPEATED kNN
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
    coarsens by three levels and ONLY unresolved probes (left_anti on
    the resolved ids) retry. Level 0 covers the sphere, so termination
    is unconditional.

    Skew (north rule — dense city cells): a coarse uniform start level
    makes every city probe join its ENTIRE city cell (quadratic in city
    rows). Instead the start level is density-adaptive: one bounded agg
    over the fact table's level-7 parents yields total count, hottest
    cell, and the hot-cell list (threshold-bounded, ≤ ~512 entries);
    probes whose 3×3 detection ring touches a hot cell start fine
    enough that a hot cell holds ~8k rows, everyone else starts at the
    global-density level. Start level is pure performance — the
    resolution contract makes any choice exact.

    Scale: per round ≤ 2 shuffle equi-joins on the parent cell (one per
    active start class; AQE broadcasts the exploded probe side once
    pending is small) + windows on query_id. Driver traffic = the
    bounded hot-cell stats up front and one scalar per round, however
    many probe rows there are.
    """
    lvl_radius = max(
        0, min(30, metrics.MIN_WIDTH.max_level(math.radians(radius_guess_deg)))
    )
    empty_out = df.select(
        F.lit(0).cast("long").alias(query_id_col),
        F.lit(0).cast("int").alias("rank"),
        F.col(id_col),
        F.lit(0.0).alias("dist_chord2"),
    ).limit(0)
    L_DET = 7
    target = 8 * kk
    if stats is None:
        cnts = (
            df.groupBy(s2_parent("cell_id", L_DET).alias("__p")).count().persist()
        )
    else:
        cnts = (
            stats.where(F.col("level") == F.lit(L_DET))
            .select(F.col("cell").alias("__p"), F.col("n").alias("count"))
            .persist()
        )
    tot_row = cnts.agg(
        F.sum("count").alias("n"), F.max("count").alias("mx")
    ).first()
    n_tot = int(tot_row["n"] or 0)
    max_cnt = int(tot_row["mx"] or 0)
    if stats is not None and n_tot == 0 and stats.limit(1).count() > 0:
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
        lvl_typ = lvl_radius
    else:
        # coarsest level where a typical 3×3 ring expects ≥ target rows;
        # the caller's radius guess is honored as a FLOOR on fineness —
        # "my neighbors are within r" means never start coarser than the
        # level whose cell width covers r (knn_join's seed semantics)
        lvl_typ = int(math.floor(math.log(max(1.0, 9 * n_tot / (6 * target)), 4)))
        lvl_typ = max(lvl_typ, lvl_radius)
    lvl_typ = max(0, min(30, lvl_typ))
    hot_thresh = max(target, n_tot // 512)  # bounds the hot list at ~512
    hot = [
        int(r["__p"]) for r in cnts.where(F.col("count") > hot_thresh).collect()
    ]
    cnts.unpersist()
    if hot and max_cnt > target:
        extra = int(math.ceil(math.log(max_cnt / target, 4)))
        lvl_dense = max(lvl_typ, min(30, L_DET + extra))
    else:
        hot, lvl_dense = [], lvl_typ

    from ..functions import s2_all_neighbors, s2_cell_from_latlng

    base = queries.select(query_id_col, qlat_col, qlng_col)
    if hot and lvl_dense != lvl_typ:
        qdet = s2_parent(
            s2_cell_from_latlng(F.col(qlat_col), F.col(qlng_col)), L_DET
        )
        ring_det = F.array_union(F.array(qdet), s2_all_neighbors(qdet, L_DET))
        is_dense = F.arrays_overlap(
            ring_det, F.array(*[F.lit(c) for c in hot])
        )
        base = base.withColumn(
            "__lvl0",
            F.when(is_dense, F.lit(lvl_dense)).otherwise(F.lit(lvl_typ)),
        )
    else:
        base = base.withColumn("__lvl0", F.lit(lvl_typ))

    pending = base.persist()
    persisted: list[DataFrame] = [pending]
    resolved: DataFrame | None = None
    all_starts = sorted({lvl_dense, lvl_typ}, reverse=True)
    attempt = 0
    while True:
        # per-class pending counts: ≤ 2 rows to the driver, and lets a
        # round skip classes that fully resolved in an earlier round
        cls = {
            int(r["__lvl0"]): int(r["n"])
            for r in pending.groupBy("__lvl0").agg(F.count("*").alias("n")).collect()
        }
        active = [s for s in all_starts if cls.get(s, 0) > 0]
        if not active:
            break
        # classes whose widened level collides share one branch
        by_cur: dict[int, list[int]] = {}
        for s in active:
            by_cur.setdefault(max(0, s - 3 * attempt), []).append(s)
        branches: list[tuple[int, DataFrame, DataFrame]] = []
        for cur, ss in sorted(by_cur.items(), reverse=True):
            pend_s = (
                pending
                if len(ss) == len(active)
                else pending.where(F.col("__lvl0").isin(ss))
            )
            ranked_s = _attempt_ranked_df(
                df, pend_s, cur, kk,
                lat_col, lng_col, id_col, query_id_col, qlat_col, qlng_col,
            ).persist()
            persisted.append(ranked_s)
            branches.append((cur, pend_s, ranked_s))
        done_round = all(
            cur == 0 for cur, _, _ in branches
        ) or attempt >= max_widen
        ok: DataFrame | None = None
        for cur, pend_s, ranked_s in branches:
            if cur == 0 or attempt >= max_widen:
                ok_s = pend_s.select(query_id_col)
            else:
                safe = _safe_chord2(cur)
                ok_s = (
                    ranked_s.groupBy(query_id_col)
                    .agg(
                        F.count("*").alias("__n"),
                        F.max("dist_chord2").alias("__dmax"),
                    )
                    .where((F.col("__n") >= kk) & (F.col("__dmax") <= F.lit(safe)))
                    .select(query_id_col)
                )
            ok = ok_s if ok is None else ok.unionByName(ok_s)
            slice_df = ranked_s.join(ok_s, query_id_col, "left_semi")
            resolved = (
                slice_df if resolved is None else resolved.unionByName(slice_df)
            )
        if done_round:
            break
        ok = ok.persist()
        persisted.append(ok)
        pending = pending.join(ok, query_id_col, "left_anti").persist()
        persisted.append(pending)
        attempt += 1
    if resolved is None:  # empty probe DataFrame — knn_join's contract
        for p in persisted:
            p.unpersist()
        return empty_out
    out = resolved.select(
        query_id_col,
        F.col("rank").cast("int").alias("rank"),
        id_col,
        "dist_chord2",
    ).localCheckpoint(eager=True)  # ≤ |probes|·k rows; frees the caches below
    for p in persisted:
        p.unpersist()
    return out


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
    # exact hits: min fact id at chord² == 0 per probe
    exact = (
        j.where(F.col("dist_chord2") == 0.0)
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.col(id_col).cast("long").asc()
                )
            ),
        )
        .where(F.col("__r") == 1)
        .select(query_id_col, F.col("__v").alias("__exact"))
    )
    # ANSI double division throws on zero — try_divide yields NULL for
    # chord² == 0 terms, poisoning that probe's fold to NULL, which the
    # exact-hit override then supplies (such a probe always has one)
    w = F.try_divide(F.lit(1.0), F.col("dist_chord2"))
    terms = j.select(
        query_id_col,
        F.struct(
            F.col("rank").alias("r"),
            (w * F.col("__v")).alias("num"),
            w.alias("den"),
        ).alias("__t"),
    )
    fold = (
        terms.groupBy(query_id_col)
        .agg(F.array_sort(F.collect_list("__t")).alias("__ts"))
        .select(
            query_id_col,
            F.try_divide(
                F.aggregate("__ts", F.lit(0.0), lambda a, x: a + x["num"]),
                F.aggregate("__ts", F.lit(0.0), lambda a, x: a + x["den"]),
            ).alias("__idw"),
        )
    )
    return fold.join(exact, query_id_col, "left").select(
        query_id_col,
        F.coalesce(F.col("__exact"), F.col("__idw")).alias("est"),
    )
