"""Per-key top-k — windowed rank with rank pushdown.

SURVEY.md §2.0b: window functions are absent in the reference; the
extension surface (A2) mandates per-user top-k over events. Spark's
``row_number`` window with a LIMIT-like filter compiles to a
WindowGroupLimit physical node (rank pushdown) that keeps only k rows
per partition *before* the final sort — the scalable shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """First k rows per key group under a total order.

    ``order_by`` must be a total order within each group for
    deterministic output (append a unique id as tie-break).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w).cast("long")).where(
        F.col(rank_col) <= k
    )
