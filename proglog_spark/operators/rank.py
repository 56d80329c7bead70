"""Global total-order ranking without a single-partition sort.

The reference has exactly one sort (crash recovery ordering segment
base offsets, `internal/log/log.go:54-56`) and no ranking surface;
global ranking enters through the analytics mandate (deciles, global
row numbers over a corpus). The naive Spark formulation —
``row_number() OVER (ORDER BY ...)`` with no PARTITION BY — collapses
ALL rows into one partition: fine at sf0.1, dead at 100 TB.

This operator computes the identical result scalably:

1. ``repartitionByRange`` on the order key — Spark samples the key
   distribution and assigns contiguous, sorted, roughly equal key
   ranges to P partitions (the same machinery a distributed ORDER BY
   uses);
2. ``sortWithinPartitions`` — each partition sorts locally, in
   parallel;
3. one tiny job counts rows per partition (P longs to the driver —
   metadata, not data);
4. each partition numbers its own rows with an Arrow-batched
   cumulative counter added to the partition's global offset — a
   narrow ``mapInPandas`` pass: no second shuffle, no per-row
   JVM→Python cost.

Total cost is one range shuffle plus one count job — the same shape
as Spark's own distributed ORDER BY — but it yields dense global
ranks with every partition working in parallel. The input is
persisted (MEMORY_AND_DISK) between the count job and the numbering
pass so both observe the same physical partitioning; callers that
run many downstream jobs over the ranked result may also persist
that result and ``unpersist()`` the input.
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["with_global_rank", "with_global_ntile"]

_PID = "_gr_pid"


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Dense 1-based global row number over ``ORDER BY order_cols``.

    Returns ``(ranked_df, total_rows)``. Ranks are exact and dense;
    ties are broken by the caller including a unique column in
    ``order_cols`` (same contract as a deterministic ORDER BY).
    """
    spark = df.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(p, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
    )
    # Pin the physical partitioning: the count job below and the
    # numbering pass must see identical partition contents.
    ranged.persist(StorageLevel.MEMORY_AND_DISK)
    counts = {r[_PID]: r["n"] for r in ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    total = acc

    out_schema = T.StructType(
        [f for f in ranged.schema.fields if f.name != _PID]
        + [T.StructField(rank_col, T.LongType(), False)]
    )
    out_cols = [f.name for f in out_schema.fields]

    def number(batches):
        # Called once per partition; batches arrive in sorted order.
        base = None
        seen = 0
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            if base is None:
                base = offsets[int(pdf[_PID].iloc[0])]
            pdf = pdf.drop(columns=[_PID])
            pdf[rank_col] = np.arange(base + seen + 1, base + seen + n + 1, dtype=np.int64)
            seen += n
            yield pdf[out_cols]

    return ranged.mapInPandas(number, out_schema), total


def with_global_ntile(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact SQL ``NTILE(n) OVER (ORDER BY order_cols)`` at scale.

    NTILE semantics: with ``total = q*n + r``, the first ``r`` tiles
    hold ``q+1`` rows and the rest hold ``q`` — derived arithmetically
    from the scalable global rank, so no engine-side window over a
    single partition is ever created.
    """
    ranked, total = with_global_rank(df, order_cols, rank_col="_gr_rank", num_partitions=num_partitions)
    q, r = divmod(total, n)
    cut = r * (q + 1)
    # Integer `div` keeps the arithmetic exact at any scale (no
    # double rounding at 10^12-row ranks).
    big = F.expr(f"(_gr_rank - 1) div {q + 1}")
    small = F.expr(f"{r} + (_gr_rank - {cut} - 1) div {max(q, 1)}")
    tile = F.when(F.col("_gr_rank") <= cut, big).otherwise(small) + 1
    return ranked.withColumn(tile_col, tile.cast("long")).drop("_gr_rank")
