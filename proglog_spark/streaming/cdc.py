"""Streaming CDC apply: a change stream continuously merged into a
keyed table.

The batch half is `sources/upsert.KeyedTable` (hash-bucketed parquet,
touched-bucket partial rewrite, crash-safe swap); this wires it to
Structured Streaming with ``foreachBatch``:

- each micro-batch is first REDUCED to its latest change per key
  (``max_by`` on the CDC sequence column — one partial-agg shuffle of
  the batch, never the table);
- the reduced batch goes through ``KeyedTable.merge``, which rewrites
  only the buckets containing touched keys — steady-state cost is
  proportional to the update spread, not the table size.

Delivery is exactly-once at the TABLE level despite foreachBatch's
at-least-once contract: a replayed batch re-merges the same latest-
per-key rows, and upsert is idempotent — re-applying converges to the
already-merged state (the same argument as the reference's FSM
re-apply after Raft snapshot restore, `internal/log/
distributed_fsm.go:25-46`, and the inverse of the dead Replicator's
duplicate-on-rejoin bug, `internal/log/replicator.go:43-87`).

Caller contract: ``order_col`` is unique per key within a batch (a
CDC sequence / LSN); without it, "latest" is not well-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proglog_spark.sources.upsert import KeyedTable


def latest_per_key(batch: DataFrame, key_col: str, order_col: str) -> DataFrame:
    """Reduce a change batch to its final row per key (by order_col)."""
    others = [c for c in batch.columns if c != key_col]
    picked = batch.groupBy(key_col).agg(
        F.max_by(F.struct(*others), F.col(order_col)).alias("_row")
    )
    return picked.select(key_col, *[F.col(f"_row.{c}").alias(c) for c in others])


def apply_cdc_stream(
    stream: DataFrame,
    table: KeyedTable,
    order_col: str,
    checkpoint: str,
):
    """Start a streaming query that merges ``stream`` into ``table``.

    Returns the StreamingQuery; stop it to stop applying. The
    checkpoint makes restarts resume from the last committed batch;
    a batch replayed after a crash re-merges idempotently.
    """
    if order_col not in stream.columns:
        raise ValueError(f"order_col {order_col!r} not in stream columns")

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        if not batch.isEmpty():
            # order_col flows into the merge too: within-batch
            # latest-per-key alone can't stop a LATE change arriving in
            # a later micro-batch from overwriting newer table data —
            # the merge compares the sequence against the stored row
            table.merge(
                latest_per_key(batch, table.key_col, order_col),
                order_col=order_col,
            )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .start()
    )
