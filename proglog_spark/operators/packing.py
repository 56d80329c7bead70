"""Sequence packing: assign ordered documents to fixed-capacity
training bins by global running token count.

Pretraining dataloaders consume fixed-length sequences; the batch-side
prep is "walk the corpus in a canonical order, fill 2048-token bins,
let documents straddle boundaries" — i.e. ``bin = tokens_before_doc
div capacity``. The hard part at scale is the GLOBAL running sum:
``sum() OVER (ORDER BY ...)`` with no PARTITION BY collapses 100 TB
into one partition.

``with_running_total`` computes it with a two-phase distributed
ORDER BY plus metadata-sized driver work:

1. range-partition + local sort on the order key,
2. one tiny job sums ``size_col`` per partition (P longs to the
   driver), prefix-summed into per-partition offsets,
3. an Arrow-batched ``mapInPandas`` pass adds each partition's local
   cumulative sum to its global offset — no second shuffle.

This module owns the shared two-phase core; ``operators/rank`` builds
global row numbers and NTILE on top of it (a rank IS the running
total of a literal-1 size column), so the pinning/recompute logic
lives in exactly one place.

``pack_sequences`` then derives the bin id arithmetically. Exact at
any scale: the running total is integers end-to-end.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["with_running_total", "pack_sequences"]

_PID = "_rt_pid"


def _running_total(
    df: DataFrame,
    order_cols: list[str],
    size_col: str,
    total_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """Shared two-phase core: (df + inclusive running total, grand
    total). The range-partitioned input is pinned with an EAGER
    localCheckpoint — like the old persist() it guarantees the stat
    job and the cumsum pass observe identical partition contents
    (repartitionByRange resamples its bounds on recompute), but its
    blocks are RDD-level, so the ContextCleaner frees them when the
    result is garbage collected instead of leaking one cached copy
    per call into the session's CacheManager."""
    for clash in (_PID, total_col):
        if clash in df.columns:
            raise ValueError(
                f"column {clash!r} already exists on the input; rename it "
                "or pass a different total_col"
            )
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(p, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
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
    total = acc

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

    return ranged.mapInPandas(cumsum, out_schema), total


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
    out, _ = _running_total(df, order_cols, size_col, total_col, num_partitions)
    return out


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
