"""Bucketed co-located joins — the BASELINE design-rule claim
("co-locate joins via bucketing, reuse a partitioning across stages")
pinned as a plan property: joining two tables bucketed+sorted on the
same key runs WITHOUT a shuffle on either side, while the same join on
plain parquet exchanges both."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    import uuid

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    suffix = uuid.uuid4().hex[:8]
    names = (f"docs_b_{suffix}", f"emb_b_{suffix}")
    (
        docs.write.bucketBy(8, "doc_id")
        .sortBy("doc_id")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(names[0])
    )
    (
        emb.write.bucketBy(8, "doc_id")
        .sortBy("doc_id")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(names[1])
    )
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse):
    dt, et = warehouse
    a = spark.table(dt)
    b = spark.table(et)
    # disable broadcast so the join strategy decision is about
    # co-location, not size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffles

        # control: the SAME join over plain parquet shuffles both sides
        pa = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        pb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        plan2 = pa.join(pb, "doc_id")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan2

        # and the result is identical either way
        n_bucketed = joined.count()
        n_plain = pa.join(pb, "doc_id").count()
        assert n_bucketed == n_plain > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
