"""Driver contract for the spark-graft builder (PySpark target).

entry:       flagship covering-join query on sf0.001
queries:     one entry per implemented operator (SURVEY.md §2)
oracle_sql:  DuckDB equivalents (same parquet views) — the centerpiece
             is a pure-SQL S2 Hilbert encoder that independently
             recomputes the full cell-id chain bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_s2_spark.functions import s2_cell_to_token, s2_parent
from rust_s2_spark.geometry import Cap
from rust_s2_spark.operators.covering_join import region_filter
from rust_s2_spark.plans import driver_queries
from rust_s2_spark.sources import images_from_orders


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geotagged images in a 3° cap around NYC, counted per
    level-8 cell with distinct-phash stats (covering join + exact
    post-filter + parent aggregation)."""
    images = images_from_orders(spark, "/root/testdata/sf0.001")
    cap = Cap.from_latlng_degrees(40.7128, -74.0060, 3.0)
    hits = region_filter(images, cap)
    return (
        hits.groupBy(s2_parent("cell_id", 8).alias("cell8"))
        .agg(
            F.count("*").alias("n_images"),
            F.countDistinct("phash").alias("n_phash"),
        )
        .withColumn("cell_token", s2_cell_to_token("cell8"))
        .orderBy("cell8")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    return driver_queries.oracle_sql()
