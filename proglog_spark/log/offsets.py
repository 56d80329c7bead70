"""Dense offset assignment — the one primitive Spark does not provide.

The reference assigns each appended record the next dense offset under
a single-writer mutex (internal/log/segment.go:46-64,
internal/log/log.go:80-92). Spark's ``monotonically_increasing_id`` is
NOT dense (it strides by partition), and a global
``row_number() OVER (ORDER BY ...)`` collapses the batch to one
partition — wrong at 100 TB scale.

Algorithm here (two narrow passes, no global shuffle):

1. Pin the batch's partition layout with ``localCheckpoint`` so both
   passes see identical partitions (AQE or lazy re-evaluation could
   otherwise re-plan between passes).
2. Pass 1: count rows per partition (map-side partial aggregation —
   bytes moved is O(#partitions), not O(rows)).
3. Driver: exclusive prefix-sum of partition counts → each
   partition's starting offset (O(#partitions) work, tiny).
4. Pass 2: ``offset = start + partition_start[pid] + row_index``
   where ``row_index`` is the record number within its partition.
   ``monotonically_increasing_id()`` documents the layout
   ``(partition_id << 33) | row_index_in_partition``, so the
   within-partition index is its low 33 bits — a pure narrow
   projection, no window, no shuffle. (Density is asserted in tests;
   per-partition row counts are capped at 2^33, analogous to the
   reference's 2^32 records-per-segment cap from uint32 relative
   offsets, internal/log/index.go:10-14.)

If ``order_by`` is given, the batch is first range-partitioned and
sorted on those columns so offsets follow that total order (one
shuffle — the unavoidable cost of an explicit total order). Without
``order_by``, offsets follow the input's partition order, matching the
reference's "arrival order" semantics for a produce stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROW_IDX_MASK = (1 << 33) - 1


def assign_dense_offsets(
    df: DataFrame,
    start: int = 0,
    order_by: Sequence[str] | None = None,
    offset_col: str = "offset",
) -> tuple[DataFrame, int]:
    """Return ``(df_with_offsets, n)``: a dense LONG ``offset_col`` =
    start, start+1, ..., start+n-1, with no gaps and no duplicates.

    ``n`` comes from the per-partition counts the algorithm already
    collects — callers never need a second count job over the batch.
    """
    spark = df.sparkSession
    if order_by:
        df = df.repartitionByRange(*order_by).sortWithinPartitions(*order_by)
    # Freeze partition layout: both the count pass and the projection
    # pass must observe the same (partition_id, row_index) assignment.
    df = df.localCheckpoint(eager=True)

    with_id = df.withColumn("_pl_mid", F.monotonically_increasing_id())
    counts = (
        with_id.groupBy(F.spark_partition_id().alias("_pl_pid"))
        .agg(F.count(F.lit(1)).alias("_pl_cnt"))
        .collect()
    )
    part_counts = {int(r["_pl_pid"]): int(r["_pl_cnt"]) for r in counts}
    starts, acc = [], int(start)
    for pid in sorted(part_counts):
        starts.append((pid, acc))
        acc += part_counts[pid]

    starts_df = spark.createDataFrame(starts, schema="_pl_pid INT, _pl_pstart LONG")
    out = (
        with_id.withColumn("_pl_pid", F.spark_partition_id())
        .join(F.broadcast(starts_df), on="_pl_pid")
        .withColumn(
            offset_col,
            (F.col("_pl_pstart") + F.col("_pl_mid").bitwiseAND(F.lit(_ROW_IDX_MASK))).cast("long"),
        )
        .drop("_pl_pid", "_pl_mid", "_pl_pstart")
    )
    return out, acc - int(start)
