"""Structured-Streaming cell assignment + windowed hypertable rollups.

The cell-id kernels are stateless pandas UDFs, so the same column
functions used in batch drive ``readStream`` pipelines unchanged
(SURVEY.md §2.9). The rollup is the streaming twin of the batch
tile-aggregation: event-time window × parent cell, with a watermark
for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import s2_biased, s2_cell_from_latlng, s2_parent


def assign_cells(
    stream: DataFrame,
    lat_col: str = "lat",
    lng_col: str = "lng",
    partition_level: int = 5,
) -> DataFrame:
    """Add cell_id / cell_id_biased / parentN columns to a stream.

    Works identically on batch and streaming DataFrames (the UDF is
    stateless and Arrow-batched).
    """
    out = stream.withColumn("cell_id", s2_cell_from_latlng(lat_col, lng_col))
    return out.withColumn("cell_id_biased", s2_biased("cell_id")).withColumn(
        f"parent{partition_level}", s2_parent("cell_id", partition_level)
    )


def windowed_cell_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    agg_level: int = 6,
    value_col: str | None = "value",
) -> DataFrame:
    """Event-time windowed counts (and value sums) per cell at
    ``agg_level`` — the streaming hypertable rollup. Late rows beyond
    the watermark are dropped; state is bounded by (windows × cells)."""
    withmark = stream.withWatermark(ts_col, watermark)
    aggs = [F.count("*").alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return withmark.groupBy(
        F.window(F.col(ts_col), window).alias("w"),
        s2_parent("cell_id", agg_level).alias("cell"),
    ).agg(*aggs)
