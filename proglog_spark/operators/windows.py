"""Event-time window aggregation (batch forms).

The reference's ConsumeStream has no event time at all (its record
has no timestamp — SURVEY.md §2.0b); the extension surface adds
tumbling / sliding / session windows over ``events.ts``. Streaming
twins live in ``proglog_spark.streaming`` — these batch forms share
the same bucket arithmetic so batch and stream results line up, and
the tumbling bucket is emitted as ``floor(epoch/width)`` (BIGINT) for
oracle parity instead of a window struct.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width_seconds: int = 3600,
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts: (bucket, *group_cols, n_events)."""
    bucket = F.floor(F.col(ts_col).cast("long") / F.lit(width_seconds)).cast("long")
    return (
        df.groupBy(bucket.alias("bucket"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width_seconds: int = 3600,
    slide_seconds: int = 1800,
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Sliding-window counts: each event lands in width/slide buckets.

    Implemented as an explode over the covering bucket starts (the
    standard Spark trick ``window(ts, w, s)`` uses internally) so the
    output bucket is a plain BIGINT start-second, oracle-comparable.
    """
    if width_seconds % slide_seconds != 0:
        # explicit raise, not assert: python -O would strip the check
        # and silently emit windows that miss events
        raise ValueError(
            f"width ({width_seconds}s) must be a multiple of slide ({slide_seconds}s)"
        )
    n = width_seconds // slide_seconds
    epoch = F.col(ts_col).cast("long")
    last_start = F.floor(epoch / slide_seconds) * slide_seconds
    starts = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: last_start - i * slide_seconds,
    )
    return (
        df.select(F.explode(starts).alias("window_start"), *group_cols)
        .where(F.col("window_start") >= 0)
        .groupBy("window_start", *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessions per user: (user_id, session_id,
    session_start_us, session_end_us, n_events).

    Classic lag+cumsum sessionization — one shuffle on user_id shared
    by both windows; timestamps kept as exact epoch-microsecond
    BIGINTs so boundaries are deterministic.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy("ts_us")
    gap_us = gap_seconds * 1_000_000
    with_breaks = df.select(
        F.col(user_col),
        us.alias("ts_us"),
    ).withColumn(
        "is_new",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w)) > gap_us, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    w2 = Window.partitionBy(user_col).orderBy("ts_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = with_breaks.withColumn(
        "session_id", F.sum("is_new").over(w2).cast("long")
    )
    return sessions.groupBy(user_col, "session_id").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
