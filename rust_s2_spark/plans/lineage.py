"""Per-partition lineage + metrics checkpointing with idempotent resume
(BASELINE.json north_rule: "resumable from checkpoint with
per-partition lineage + metrics").

The output table is written one Hilbert bucket at a time (bucket =
parent cell at ``bucket_level``, computed natively). After each bucket
lands, a lineage row (step, bucket, rows, bytes-proxy, min/max biased
cell id, wall seconds) is appended to ``<base>/_lineage``. A restarted
job calls ``pending_buckets`` and skips everything already recorded —
partial bucket directories are simply overwritten (dynamic partition
overwrite), so the resume is idempotent.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import s2_biased, s2_parent

LINEAGE_SCHEMA = (
    "step string, bucket long, n_rows long, min_cell_biased long, "
    "max_cell_biased long, wall_sec double, completed_at double"
)


def _lineage_path(base: str) -> str:
    return f"{base}/_lineage"


def completed_buckets(spark: SparkSession, base: str, step: str) -> set[int]:
    try:
        ln = spark.read.schema(LINEAGE_SCHEMA).parquet(_lineage_path(base))
    except Exception:
        return set()
    return {
        r.bucket
        for r in ln.where(F.col("step") == step).select("bucket").distinct().collect()
    }


def pending_buckets(
    spark: SparkSession, df: DataFrame, base: str, step: str, bucket_level: int
) -> list[int]:
    all_buckets = [
        r.b
        for r in df.select(s2_parent("cell_id", bucket_level).alias("b"))
        .distinct()
        .collect()
    ]
    done = completed_buckets(spark, base, step)
    return sorted(b for b in all_buckets if b not in done)


def write_with_lineage(
    spark: SparkSession,
    df: DataFrame,
    base: str,
    step: str,
    bucket_level: int = 4,
) -> int:
    """Write df partitioned by Hilbert bucket with per-bucket lineage;
    resumes past completed buckets on restart. Returns #buckets written
    this invocation."""
    df = df.withColumn("__bucket", s2_parent("cell_id", bucket_level))
    todo = pending_buckets(spark, df, base, step, bucket_level)
    written = 0
    for bucket in todo:
        t0 = time.time()
        part = df.where(F.col("__bucket") == bucket).drop("__bucket").cache()
        stats = part.agg(
            F.count("*").alias("n"),
            F.min(s2_biased("cell_id")).alias("mn"),
            F.max(s2_biased("cell_id")).alias("mx"),
        ).collect()[0]
        part.write.mode("overwrite").parquet(f"{base}/bucket={bucket}")
        part.unpersist()
        row = [
            (
                step,
                int(bucket),
                int(stats["n"]),
                int(stats["mn"]),
                int(stats["mx"]),
                float(time.time() - t0),
                time.time(),
            )
        ]
        spark.createDataFrame(row, LINEAGE_SCHEMA).write.mode("append").parquet(
            _lineage_path(base)
        )
        written += 1
    return written


def read_output(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.option("basePath", base).parquet(f"{base}/bucket=*")
