"""Time-aware joins the reference cannot express and Spark lacks natively.

The reference contains zero joins (SURVEY.md §2.0b: "joins — absent");
these are north-star training-pipeline extensions, built Spark-first:

- :func:`asof_join` — "latest right row at or before each left row",
  the pandas ``merge_asof`` / kdb ``aj`` semantic. Implemented as ONE
  window over a tagged union of both sides: a single shuffle keyed by
  the join key, no inequality join, no per-key collect. At cluster
  scale the shuffle is an ordinary hash partition on the key; hot keys
  are the caveat (same as any window) and AQE handles moderate skew.

- :func:`range_join` — equi-key + interval-containment join
  (``start <= t < end``) without the nested-loop fallback Spark uses
  for inequality conditions. Both sides are mapped to coarse time
  buckets, intervals explode to every bucket they cover, and the join
  becomes a plain equi-join on (key, bucket) that Catalyst hashes or
  sort-merges; the exact predicate then refines. Bucket fan-out is
  ``interval_length / bucket_width + 1`` rows per interval — pick the
  bucket near the typical interval length so fan-out is ~2×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    tie_break: str,
    payload_cols: list[str] | None = None,
    how: str = "left",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For every left row, attach the most recent right row with the
    same key and ``right_time <= left_time`` (or ``<`` when
    ``allow_exact_matches=False``).

    Deterministic: among right rows sharing (key, time), the one with
    the greatest ``tie_break`` wins — equivalent to SQL
    ``row_number() OVER (ORDER BY time DESC, tie_break DESC) = 1``.

    Single-shuffle plan: tag each side, union, then one window
    ``last(right_payload, ignorenulls=True)`` ordered by
    (time, side, tie_break) with rows-unbounded-preceding. Right rows
    sort before left rows at equal time iff exact matches are allowed,
    so the frame of each left row contains exactly its admissible
    right rows; left rows carry NULL payload and can never pollute
    another left row's ``last``. Ties among left rows are harmless for
    the same reason, so the ROWS frame is deterministic even though
    sort keys repeat.

    ``how``: 'left' keeps unmatched left rows (NULL payload), 'inner'
    drops them.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (*keys, right_time)]
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left columns: {clash}")
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")

    l_struct = F.struct(*[F.col(c) for c in left.columns])
    r_struct = F.struct(*[F.col(c) for c in payload_cols])
    l_type = left.select(l_struct.alias("s")).schema["s"].dataType
    r_type = right.select(r_struct.alias("s")).schema["s"].dataType
    tie_type = right.select(F.col(tie_break).alias("t")).schema["t"].dataType

    # right rows sort before equal-time left rows when exact matches
    # are admissible, after them when they are not
    left_side, right_side = (1, 0) if allow_exact_matches else (0, 1)
    tagged_left = left.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.col(left_time).alias("_t"),
        F.lit(left_side).alias("_side"),
        F.lit(None).cast(tie_type).alias("_tie"),
        l_struct.alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    tagged_right = right.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.col(right_time).alias("_t"),
        F.lit(right_side).alias("_side"),
        F.col(tie_break).alias("_tie"),
        F.lit(None).cast(l_type).alias("_l"),
        r_struct.alias("_r"),
    )
    w = (
        Window.partitionBy(*[f"_k{i}" for i in range(len(keys))])
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        tagged_left.unionByName(tagged_right)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_side") == left_side)
    )
    if how == "inner":
        matched = matched.where(F.col("_m").isNotNull())
    return matched.select(
        F.col("_l.*"), *[F.col(f"_m.{c}").alias(c) for c in payload_cols]
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    interval_key: str,
    point_time: str,
    interval_start: str,
    interval_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join each point row to every interval row with the same key and
    ``interval_start <= point_time < interval_end``, as an equi-join.

    Column names must be disjoint across the two inputs (pre-alias for
    self-joins). Output carries all columns of both sides.

    Plan shape: points get ``floor(unix_micros(t) / W)``; intervals
    explode to the bucket range they cover (``sequence`` over floor'd
    endpoints — end exclusive, so an interval ending exactly on a
    bucket boundary does not claim the next bucket). The equi-join on
    (key, bucket) is broadcast/hash/sort-merge per Catalyst's choice
    instead of BroadcastNestedLoopJoin, and each (point, interval)
    match arises in exactly one bucket — no post-join dedup needed.
    """
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"point/interval column names must be disjoint: {clash}")
    w_micros = int(bucket_seconds) * 1_000_000
    p = points.withColumn("_pb", F.floor(F.unix_micros(F.col(point_time)) / w_micros))
    i = (
        intervals.where(F.col(interval_end) > F.col(interval_start))
        .withColumn(
            "_ib",
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(interval_start)) / w_micros),
                    F.floor((F.unix_micros(F.col(interval_end)) - 1) / w_micros),
                )
            ),
        )
    )
    return (
        p.join(
            i,
            on=[
                p["_pb"] == i["_ib"],
                p[point_key] == i[interval_key],
            ],
        )
        .where(
            (F.col(point_time) >= F.col(interval_start))
            & (F.col(point_time) < F.col(interval_end))
        )
        .drop("_pb", "_ib")
    )
