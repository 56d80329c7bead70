"""Global total-order ranking without a single-partition sort.

The reference has exactly one sort (crash recovery ordering segment
base offsets, `internal/log/log.go:54-56`) and no ranking surface;
global ranking enters through the analytics mandate (deciles, global
row numbers over a corpus). The naive Spark formulation —
``row_number() OVER (ORDER BY ...)`` with no PARTITION BY — collapses
ALL rows into one partition: fine at sf0.1, dead at 100 TB.

A global rank IS the inclusive running total of a literal-1 size
column, so this module is a thin layer over the shared two-phase
core in `operators/packing` (range-partition + local sort, one
metadata-sized per-partition stat job, one Arrow-batched offset
pass — the same shape as Spark's own distributed ORDER BY, with the
pinned intermediate held as an RDD-level localCheckpoint the
ContextCleaner frees on GC rather than a leaked cache entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proglog_spark.operators.packing import _running_total

__all__ = ["with_global_rank", "with_global_ntile"]

_ONE = "_gr_one"


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Dense 1-based global row number over ``ORDER BY order_cols``.

    Returns ``(ranked_df, total_rows)``. Ranks are exact and dense
    (the running count of ones); ties are broken by the caller
    including a unique column in ``order_cols`` (same contract as a
    deterministic ORDER BY).
    """
    if _ONE in df.columns:
        raise ValueError(f"column {_ONE!r} already exists on the input")
    ranked, total = _running_total(
        df.withColumn(_ONE, F.lit(1)), order_cols, _ONE, rank_col, num_partitions
    )
    return ranked.drop(_ONE), total


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
    if "_gr_rank" in df.columns:
        raise ValueError("column '_gr_rank' already exists on the input")
    ranked, total = with_global_rank(
        df, order_cols, rank_col="_gr_rank", num_partitions=num_partitions
    )
    q, r = divmod(total, n)
    cut = r * (q + 1)
    # Integer `div` keeps the arithmetic exact at any scale (no
    # double rounding at 10^12-row ranks).
    big = F.expr(f"(_gr_rank - 1) div {q + 1}")
    small = F.expr(f"{r} + (_gr_rank - {cut} - 1) div {max(q, 1)}")
    tile = F.when(F.col("_gr_rank") <= cut, big).otherwise(small) + 1
    return ranked.withColumn(tile_col, tile.cast("long")).drop("_gr_rank")
