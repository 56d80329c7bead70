"""Sequence packing: assign ordered documents to fixed-capacity
training bins by global running token count.

Pretraining dataloaders consume fixed-length sequences; the batch-side
prep is "walk the corpus in a canonical order, fill 2048-token bins,
let documents straddle boundaries" — i.e. ``bin = tokens_before_doc
div capacity``. The hard part at scale is the GLOBAL running sum:
``sum() OVER (ORDER BY ...)`` with no PARTITION BY collapses 100 TB
into one partition.

``with_running_total`` computes it with the same two-phase shape as
`operators/rank.with_global_rank` (a distributed ORDER BY plus
metadata-sized driver work):

1. range-partition + local sort on the order key,
2. one tiny job sums ``size_col`` per partition (P longs to the
   driver), prefix-summed into per-partition offsets,
3. an Arrow-batched ``mapInPandas`` pass adds each partition's local
   cumulative sum to its global offset — no second shuffle.

``pack_sequences`` then derives the bin id arithmetically. Exact at
any scale: the running total is integers end-to-end.
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["with_running_total", "pack_sequences"]

_PID = "_rt_pid"


def with_running_total(
    df: DataFrame,
    order_cols: list[str],
    size_col: str,
    total_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive global running sum of ``size_col`` over ``ORDER BY
    order_cols`` (ties broken by including a unique column, same
    contract as a deterministic ORDER BY)."""
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(p, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
    )
    # Pin the physical partitioning: the sum job and the cumsum pass
    # must observe identical partition contents.
    ranged.persist(StorageLevel.MEMORY_AND_DISK)
    sums = {
        r[_PID]: r["s"]
        for r in ranged.groupBy(_PID)
        .agg(F.sum(size_col).cast("long").alias("s"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]

    out_schema = T.StructType(
        [f for f in ranged.schema.fields if f.name != _PID]
        + [T.StructField(total_col, T.LongType(), False)]
    )
    out_cols = [f.name for f in out_schema.fields]

    def cumsum(batches):
        base = None
        carried = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf[_PID].iloc[0])]
            local = pdf[size_col].to_numpy(dtype=np.int64).cumsum()
            pdf = pdf.drop(columns=[_PID])
            pdf[total_col] = base + carried + local
            carried += int(local[-1])
            yield pdf[out_cols]

    return ranged.mapInPandas(cumsum, out_schema)


def pack_sequences(
    df: DataFrame,
    order_cols: list[str],
    size_col: str,
    capacity: int,
    bin_col: str = "bin_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous-fill packing: ``bin = (running_total - size) div
    capacity`` — the bin where each document STARTS (documents may
    straddle bin boundaries, as dataloaders that concatenate-and-chunk
    do)."""
    cum = with_running_total(
        df, order_cols, size_col, total_col="_rt_cum", num_partitions=num_partitions
    )
    return cum.withColumn(
        bin_col, F.expr(f"(_rt_cum - {size_col}) div {int(capacity)}")
    ).drop("_rt_cum")
