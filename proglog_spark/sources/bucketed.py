"""Bucketed table layout — shuffle-free co-located joins at scale.

The reference co-locates nothing (single-writer segments, O1-O15); at
100 TB the dominant cost of every key join is the shuffle. Spark's
answer is bucketing: both tables pre-hash-partitioned on the join key
into the same number of buckets at WRITE time, so a later join reads
bucket i against bucket i with no Exchange in the plan at all — the
shuffle is paid once when the table is laid down, then amortized over
every subsequent join/aggregation on that key.

Use for the repeatedly-joined big-big cases (events↔users,
lineitem↔orders); broadcast remains the right call for small dims.
Bucket count is a layout decision: pick ``total_size / target ~256 MB``
at the expected full scale, not the test scale — too few buckets caps
join parallelism, too many makes small files.

``tests/test_bucketed.py`` pins the no-Exchange plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    sort_by: str | list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed by ``key`` into ``n_buckets``.

    ``sort_by`` additionally sorts within each bucket file, letting a
    later sort-merge join skip its Sort too (and giving parquet
    row-group min/max stats real pruning power on that column).
    ``path`` makes it an external table (tests point this at a tmp
    dir); default is the session warehouse.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort_by is not None:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sorts)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same key with equal bucket
    counts; Catalyst satisfies both sides' distribution requirements
    from the layout, so the plan carries no Exchange."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on=on_cols, how=how)
