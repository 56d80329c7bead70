"""Multi-dimensional file layout: Z-order clustering for stat-based
file skipping.

Parquet scans prune on footer min/max statistics (the engine's analog
of the reference's offset index + segment routing,
`internal/log/index.go:40-56`, `internal/log/log.go:99-104`). A sort
on ONE column makes that column's per-file ranges tight and every
other column's ranges full-width — a filter on the second column then
skips nothing. Z-ordering interleaves the bits of several columns
into one clustering key so EVERY participating column's per-file
range shrinks (~N^(1/k) of the domain per file for k columns), which
is what makes 100 TB scans with filters on (user, time) or
(tenant, date) skip most files regardless of which dimension the
query constrains.

All of it is plain DataFrame code: the z-key is a JVM-side
shift/mask expression (whole-stage codegen, no UDF), the layout job
is ONE range-partition shuffle + an in-partition sort — exactly the
cost of any layout rewrite, run once per ingest batch or compaction
(`LogTable.compact` is the single-dimension sibling).

Caller contract: z-order inputs must be small non-negative integers
(bucket/rank first — e.g. ``user_id % 4096``, ``unix_micros div
3_600_000_000``). Interleaving raw 64-bit values would overflow the
key and cluster on noise bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[str | Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one LONG.

    ``len(cols) * bits`` must fit in 63 bits. The expression is pure
    shift/and/or — Catalyst folds it into whole-stage codegen.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed LONG")
    mask = (1 << bits) - 1
    masked = [
        (c if isinstance(c, Column) else F.col(c)).cast("long").bitwiseAND(
            F.lit(mask)
        )
        for c in cols
    ]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, m in enumerate(masked):
            bit = F.shiftright(m, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_on: list[str | Column],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "error",
) -> None:
    """Write ``df`` as Parquet clustered on the Z-curve of
    ``zorder_on``: range-partition by z-key (one shuffle; contiguous
    curve segments per file) + in-partition sort (tight footer stats
    within each file), then drop the key — the layout is invisible to
    readers except through pruning.
    """
    keyed = df.withColumn("__z", zorder_key(zorder_on, bits))
    if num_files is not None:
        keyed = keyed.repartitionByRange(num_files, "__z")
    else:
        keyed = keyed.repartitionByRange("__z")
    keyed.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)
