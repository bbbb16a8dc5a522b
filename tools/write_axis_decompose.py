#!/usr/bin/env python
"""Decompose the Hilbert range-layout write into stage timings
(VERDICT r5/r6 carried item: the write axis holds ~0.76 scaling
efficiency 2→8 cores — attribute it to sample/shuffle+sort/write).

Stages, each a separate timed job in one session (run the script once
per core count, fresh process per level — JVM state pollutes
back-to-back sessions):

  encode      images_from_orders → noop sink: the pandas-UDF encode
              scan only, no exchange, no parquet.
  layout_noop encode → repartitionByRange(64) → sortWithinPartitions →
              noop sink: adds the range-boundary SAMPLING pass (which
              re-runs the encode lineage), the shuffle, and the sort —
              but not the parquet encode or disk.
  layout_full the real write_images_table path (parquet to a temp dir).

Derived:  sample+shuffle+sort ≈ layout_noop − encode
          parquet encode+IO   ≈ layout_full − layout_noop

Usage: python tools/write_axis_decompose.py <cores> [mult]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_spark  # noqa: E402
from rust_s2_spark.sources.images import layout_transform  # noqa: E402


def timed_min(fn, repeats=3):
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    cores = int(sys.argv[1])
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = make_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    from rust_s2_spark.sources.images import images_from_orders

    def df():
        return images_from_orders(spark, sf_dir, with_bytes=False, multiplier=mult)

    n = df().count()  # warm-up: python workers + codegen

    def encode():
        df().write.format("noop").mode("overwrite").save()

    def layout_noop():
        layout_transform(df()).write.format("noop").mode("overwrite").save()

    tmp = tempfile.mkdtemp(prefix="s2wdec_")

    def layout_full():
        layout_transform(df()).write.mode("overwrite").parquet(f"{tmp}/images")

    out = {"cores": cores, "rows": n}
    out["encode"] = round(timed_min(encode), 3)
    out["layout_noop"] = round(timed_min(layout_noop), 3)
    out["layout_full"] = round(timed_min(layout_full), 3)
    out["sample_shuffle_sort"] = round(out["layout_noop"] - out["encode"], 3)
    out["parquet_write"] = round(out["layout_full"] - out["layout_noop"], 3)
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
