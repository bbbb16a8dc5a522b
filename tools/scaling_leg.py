"""Run ONE leg of the north-rule scaling proxy in its own process.

The bench's SPARK_GRAFT_SCALING block runs both core counts in one
process; BASELINE.md's tables are measured one-leg-per-process because
JVM state (codegen caches, GC heap shape) pollutes back-to-back
sessions. This tool is that per-process leg: same job as the bench
block (generate + encode pandas UDF + covering join + per-cell agg),
layout-constant input splits, warm-up + min-of-3.

Round-8 usage (the 8→32 leg; splits and mult raised so the parallel
portion dominates the ~4.4 s session fixed cost measured by the
round-7 Amdahl fit):

    python tools/scaling_leg.py 8  --mult 360 --splits 64 --shuffle-partitions 64
    python tools/scaling_leg.py 32 --mult 360 --splits 64 --shuffle-partitions 64

(--shuffle-partitions 64 is part of the published methodology: without
it make_spark sets max(16, 2*cores) — 16 vs 64 across the pair, a
config-varying comparison that understates the small leg by ~20%.)

Interpret the pair against tools/hw_calibration.py: this box's 32
"cores" deliver only ~3.26x the aggregate ALU throughput of 8 (0.815
per nominal unit), so job efficiency is reported both nominal and
per-delivered-hardware-unit.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cores", type=int)
    ap.add_argument("--mult", type=int, default=360)
    ap.add_argument("--splits", type=int, default=64)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument(
        "--shuffle-partitions", type=int, default=0,
        help="pin spark.sql.shuffle.partitions for BOTH legs (0 = the "
        "bench default max(16, 2*cores), which is NOT layout-constant "
        "across a wide pair — pass e.g. 64 to hold it fixed)",
    )
    args = ap.parse_args()

    from bench import make_spark, spatial_pipeline
    from rust_s2_spark.sources.images import images_from_orders

    s = make_spark(args.cores)
    if args.shuffle_partitions:
        s.conf.set(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )

    def job():
        df = images_from_orders(
            s, args.sf_dir, with_bytes=False, multiplier=args.mult,
            n_splits=args.splits,
        )
        return spatial_pipeline(s, df)

    n_matched = job()  # warm-up (JVM codegen + Python worker spin-up)
    times = []
    for _ in range(args.trials):
        t0 = time.perf_counter()
        job()
        times.append(time.perf_counter() - t0)
    n_rows = s.read.parquet(f"{args.sf_dir}/orders.parquet").count() * args.mult
    dt = min(times)
    print(
        json.dumps(
            {
                "cores": args.cores,
                "shuffle_partitions": int(
                    s.conf.get("spark.sql.shuffle.partitions")
                ),
                "mult": args.mult,
                "splits": args.splits,
                "rows": n_rows,
                "sec_min": round(dt, 3),
                "sec_all": [round(t, 3) for t in times],
                "images_per_sec": round(n_rows / dt, 1),
                "matched": n_matched,
            }
        )
    )
    s.stop()


if __name__ == "__main__":
    main()
