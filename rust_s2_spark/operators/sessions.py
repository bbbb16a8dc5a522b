"""Gap-based event sessionization (training-data pipeline op).

The classic shape: per user, order events by time and cut a new session
whenever the gap to the previous event exceeds a threshold. Everything
is window functions — one shuffle on the user key, no Python — and the
arithmetic is integer microseconds, so any engine (and the DuckDB
oracle) reproduces session boundaries exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a per-user session index to every event: session_idx
    starts at 1 and increments whenever the gap to the previous event
    (same user, ordered by timestamp with the event id as a
    deterministic tiebreak) exceeds ``gap_seconds``.

    At 100 TB this is one shuffle on the user key; the running-sum
    window is computed within each user's partition slice. Timestamps
    compare as integer microseconds (no float time arithmetic).
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    # timestampdiff is timezone-free (works on TIMESTAMP_NTZ and never
    # shifts through a session timezone — an epoch conversion would)
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = F.expr(f"timestampdiff(MICROSECOND, __prev, {ts_col})")
    new_session = F.when(
        F.col("__prev").isNull() | (gap_us > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("__prev", prev)
        .withColumn(
            "session_idx",
            F.sum(new_session)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
        .drop("__prev")
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregates over ``sessionize``: event count, duration
    in integer microseconds, and the first event id — all exact-integer
    outputs, so the oracle comparison is value-exact."""
    s = sessionize(df, user_col, ts_col, id_col, gap_seconds)
    return s.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.expr(
            f"timestampdiff(MICROSECOND, min({ts_col}), max({ts_col}))"
        ).alias("duration_us"),
        F.min(id_col).alias("first_event"),
    )
