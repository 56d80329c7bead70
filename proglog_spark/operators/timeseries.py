"""Time-series regularization: dense bucket spines and gap filling.

Event logs are irregular; downstream consumers (rate monitors,
anomaly detectors, training-data mixers) want a REGULAR series —
every (key, bucket) present, zeros where nothing happened. The
reference has no time at all (its record has no timestamp field,
`api/v1/log.proto:7-12`); this is north-star pipeline surface.

``gap_fill`` builds the dense spine declaratively:

1. bucket each row to ``floor(epoch/granularity)`` (JVM-side),
2. aggregate counts per (key, bucket) — ONE partial-agg shuffle over
   the events,
3. generate the spine with ``sequence()`` + ``explode`` from the
   1-row global bounds — row count = range/granularity, born on the
   cluster, never collected,
4. cross-join the (small, distinct) key set — broadcast,
5. left-join the aggregated counts back and zero-fill, then a
   cumulative window per key.

100 TB posture: the heavy side (raw events) is touched exactly once,
in step 2, and only aggregates flow into the spine join. The spine
itself is |keys| x buckets rows — for a year of minutes x 1e4 keys
that is 5e9 synthetic rows, so keep granularity x range honest, or
partition the spine build by key range. The cumulative window
shuffles by key once (spine rows, not events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gap_fill(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    granularity_seconds: int,
) -> DataFrame:
    """Dense zero-filled per-key bucket counts with running totals.

    Output: ``*key_cols, bucket (BIGINT, epoch/granularity), n_events,
    cum_events`` — one row per (key, bucket) for EVERY bucket between
    the global min and max observed bucket, ordered by key, bucket.
    """
    g = int(granularity_seconds)
    # integer-only bucket arithmetic: epoch micros div (g * 1e6) —
    # double division would be exact here (epoch µs < 2^53) but
    # integral div keeps the whole expression in LongType codegen
    bucketed = df.select(
        *key_cols,
        F.expr(f"unix_micros({ts_col}) div {g * 1_000_000}").alias("bucket"),
    )
    counts = bucketed.groupBy(*key_cols, "bucket").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    bounds = bucketed.agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket")
    )
    keys = bucketed.select(*key_cols).distinct()
    grid = spine.crossJoin(F.broadcast(keys))
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(counts, [*key_cols, "bucket"], "left")
        .select(
            *key_cols,
            "bucket",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        )
        .withColumn("cum_events", F.sum("n_events").over(w).cast("bigint"))
        .orderBy(*key_cols, "bucket")
    )
