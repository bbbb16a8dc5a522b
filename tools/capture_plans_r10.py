"""Capture .explain('formatted') plans for the round-10 optimization
deliverable (plans/r10/<name>_{before,after}.txt).

Usage: python tools/capture_plans_r10.py <repo_root> <tag> <outdir>
Run once with the round-9 tree (tag=before) and once with the round-10
tree (tag=after). Iterative operators (kNN widening, connected
components) execute eagerly, so their artifact is the per-round /
per-attempt plan — the piece the optimization changed — not the
checkpoint scan the finished result exposes.
"""

from __future__ import annotations

import io
import os
import shutil
import sys
import tempfile
from contextlib import redirect_stdout


def grab(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    root, tag, outdir = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, root)
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"plan-capture-{tag}")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from rust_s2_spark.sources.images import read_images_table, write_images_table

    table_path = tempfile.mkdtemp(prefix=f"s2plan_{tag}_") + "/images"
    try:
        write_images_table(
            spark, "/root/testdata/sf0.01", table_path, with_bytes=False
        )
        img = read_images_table(spark, table_path)
        iid = F.col("image_id").cast("long")
        probes = img.where(iid % 3 == 0).select(
            iid.alias("query_id"),
            F.col("lat").alias("qlat"),
            F.col("lng").alias("qlng"),
        )

        out = {}

        # --- kNN widening attempt (the restructured core) ---
        import rust_s2_spark.operators.knn as KN

        if hasattr(KN, "_attempt_var"):
            import numpy as np

            hist = img.groupBy(KN.s2_parent("cell_id", 7).alias("__p")).count().collect()
            cells7 = np.array([r["__p"] for r in hist], dtype=np.int64).view(np.uint64)
            n7 = np.array([r["count"] for r in hist], dtype=np.int64)
            prep = KN._probe_prep_udf(cells7, n7, 24)
            pend = probes.withColumn("__p", prep(F.col("qlat"), F.col("qlng"))).select(
                "query_id", "qlat", "qlng",
                F.col("__p.jl").alias("__jl"), F.col("__p.ring").alias("__ring"),
            )
            cand = pend.select(
                "query_id", "qlat", "qlng", "__jl",
                F.explode("__ring").alias("__tc"),
            )
            active = sorted(
                int(r["__jl"]) for r in pend.select("__jl").distinct().collect()
            )
            out["knn_df_attempt"] = (
                f"[{tag}] ONE widening attempt over ALL probes: per-probe "
                f"density-derived start levels (active={active}), fact side "
                "exploded to ancestors at exactly the active levels, ONE "
                "equi-join, resolution flags computed in the window pass.\n\n"
                + grab(
                    KN._attempt_var(
                        img, cand, 3, active,
                        "lat", "lng", "image_id", "query_id", "qlat", "qlng",
                    )
                )
            )
        else:
            out["knn_df_attempt"] = (
                f"[{tag}] one widening attempt PER START-LEVEL CLASS "
                "(two classes -> the fact table is scanned+joined twice per "
                "round); resolution needs a separate groupBy aggregation "
                "per class. Shown: the typical-class attempt at level 6.\n\n"
                + grab(
                    KN._attempt_ranked_df(
                        img, probes, 6, 3,
                        "lat", "lng", "image_id", "query_id", "qlat", "qlng",
                    )
                )
            )

        # --- winnowing fingerprints ---
        from rust_s2_spark.operators.text import winnow_fingerprints

        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        out["winnow"] = grab(winnow_fingerprints(docs, "text", "doc_id", k=8, w=8))

        # --- trajectory crossings (fully lazy plan) ---
        from rust_s2_spark.operators.polyline import polyline_crossing_join
        from rust_s2_spark.plans.driver_queries import (
            TRAJ_MAX_SEG_DEG,
            _trajectories,
        )

        traj = _trajectories(spark, "/root/testdata/sf0.01").where(
            F.col("traj_id") % 4 == 0
        )
        out["traj_crossings"] = grab(
            polyline_crossing_join(traj, TRAJ_MAX_SEG_DEG)
        )

        # --- IDW assembly (the part after the eager kNN join) ---
        from rust_s2_spark.operators.knn import idw_interpolate

        facts_idw = img.withColumn(
            "val", (F.col("phash") % 997).cast("double")
        )
        out["idw"] = grab(
            idw_interpolate(
                facts_idw, probes.limit(500), 3, "val", radius_guess_deg=2.0
            )
        )

        for name, text in out.items():
            with open(f"{outdir}/{name}_{tag}.txt", "w") as f:
                f.write(text)
            print("wrote", name, tag)
    finally:
        shutil.rmtree(os.path.dirname(table_path), ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
