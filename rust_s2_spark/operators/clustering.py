"""Density-based spatial clustering (deterministic DBSCAN) composed
from the exact spatial primitives.

DBSCAN over points on the sphere: a point is CORE when its closed
eps-neighborhood holds >= min_pts points; clusters are the connected
components of the core-core eps-graph; a non-core point within eps of
a core is a BORDER member of that core's cluster; everything else is
NOISE. Reference semantics: the eps-neighborhood is the reference's
point_index range query (point_index.rs), applied symmetrically.

Everything is exact and deterministic:
- neighborhoods come from ``within_distance_pairs`` (ring-guarantee
  candidates + exact chord² filter — recall verified, not assumed);
- components are hash-to-min label propagation with a convergence
  witness (``dedup.connected_components``), labels = min core id;
- the classic nondeterminism of DBSCAN border assignment (first core
  to reach it wins) is replaced by a deterministic rule: a border
  point joins the MINIMUM cluster label among its core neighbors.

Scale shape: one within-distance self-join (one shuffle on the ring
cell key), one degree aggregation, O(core-graph diameter) label
rounds, one border join — no step is quadratic in the corpus, only in
true neighbor pairs (the answer's own size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .covering_join import within_distance_pairs
from .dedup import connected_components


def dbscan_clusters(
    df: DataFrame,
    eps_deg: float,
    min_pts: int,
    id_col: str = "image_id",
    lat_col: str = "lat",
    lng_col: str = "lng",
    cell_col: str = "cell_id",
    max_iter: int = 25,
) -> DataFrame:
    """(id, cluster, role) for every input point: role ∈ {'core',
    'border', 'noise'}; cluster = the component's min core id for
    core/border rows, NULL for noise. ``min_pts`` counts the CLOSED
    neighborhood (the point itself included, the classic definition).

    ``id_col`` must be unique; ids are compared as LONG (pair
    canonicalization and min-label rules are numeric — a raw string
    id column would order "12" < "2").
    """
    pts = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(lat_col).alias("lat"),
        F.col(lng_col).alias("lng"),
        F.col(cell_col).alias("cell_id"),
    )
    pairs = within_distance_pairs(
        pts, eps_deg, id_col="id", lat_col="lat", lng_col="lng",
        cell_col="cell_id",
    )
    sym = pairs.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionByName(pairs.select(F.col("b").alias("u"), F.col("a").alias("v")))
    deg = sym.groupBy(F.col("u").alias("id")).agg(F.count("*").alias("__n"))
    marked = (
        pts.select("id")
        .join(deg, "id", "left")
        .select("id", (F.coalesce(F.col("__n"), F.lit(0)) + 1).alias("__nn"))
    )
    cores = (
        marked.where(F.col("__nn") >= int(min_pts))
        .select("id")
        .localCheckpoint(eager=True)  # reused 4×; bounded by |df|
    )
    core_edges = (
        sym.join(cores.select(F.col("id").alias("u")), "u", "left_semi")
        .join(cores.select(F.col("id").alias("v")), "v", "left_semi")
    )
    comp = connected_components(core_edges, "u", "v", max_iter=max_iter)
    core_lab = (
        cores.join(comp, cores["id"] == comp["v"], "left")
        .select(
            "id",
            # a core with no core neighbor is its own singleton cluster
            F.coalesce(F.col("component"), F.col("id")).alias("cluster"),
            F.lit("core").alias("role"),
        )
    )
    # border: non-core with >= 1 core neighbor → min core-cluster label
    border_lab = (
        sym.join(cores.select(F.col("id").alias("u")), "u", "left_anti")
        .join(
            core_lab.select(
                F.col("id").alias("v"), F.col("cluster").alias("__c")
            ),
            "v",
        )
        .groupBy(F.col("u").alias("id"))
        .agg(F.min("__c").alias("cluster"))
        .select("id", "cluster", F.lit("border").alias("role"))
    )
    labeled = core_lab.unionByName(border_lab)
    noise = (
        pts.select("id")
        .join(labeled.select("id"), "id", "left_anti")
        .select(
            "id",
            F.lit(None).cast("long").alias("cluster"),
            F.lit("noise").alias("role"),
        )
    )
    return labeled.unionByName(noise)
