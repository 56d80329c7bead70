"""ProduceStream — streaming appends with per-batch offset assignment.

The reference's ProduceStream RPC (internal/server/server.go:122-136)
is a loop of appends, each acked with its assigned offset. Here a
streaming source feeds ``foreachBatch``, and each micro-batch is
appended to the LogTable under the single-writer invariant — the
batch's dense offset range is the "ack".

Delivery contract: ``foreachBatch`` is at-least-once, so a replayed
micro-batch (driver death between the parquet commit and the
streaming checkpoint commit) would double-append. A batch-id marker
persisted in the log's meta file AFTER each append makes replays
no-ops, narrowing duplication to a crash exactly between the data
commit and the marker write; closing that last window needs an
atomically-committing table format (Delta/Iceberg) — the reference's
equivalent durability point is the Raft quorum (SURVEY.md §3.1).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.streaming as S
from pyspark.sql import DataFrame

from proglog_spark.log.table import LogTable


def produce_stream(
    source: DataFrame,
    log: LogTable,
    checkpoint_dir: str,
    on_ack: Callable[[int, int, int], None] | None = None,
    trigger_seconds: float | None = None,
    order_by: list[str] | None = None,
) -> S.StreamingQuery:
    """Append a streaming source (columns value[, term[, type]]) to the
    log; ``on_ack(batch_id, first_offset, last_offset)`` mirrors the
    per-record offset acks of the reference's bidi stream.

    ``order_by``: columns fixing each batch's offset order (one range
    shuffle per batch); without it offsets follow partition order —
    fine for a produce firehose, required when deriving a log whose
    order must track an upstream key (see ``streaming/derive.py``).

    The replay marker is scoped to the CHECKPOINT identity (batch ids
    restart from 0 for every new checkpoint): a fresh produce_stream
    into a log that previously absorbed N batches from a different
    checkpoint must not have its first N+1 batches silently skipped.
    A marker written by an older version (no checkpoint scope) is
    honored as matching, preserving replay safety for existing logs.
    """
    import hashlib
    import os

    marker_id = hashlib.md5(
        os.path.abspath(checkpoint_dir).encode("utf-8")
    ).hexdigest()[:16]

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        same_query = log.last_produce_marker in (None, marker_id)
        if (
            same_query
            and log.last_produce_batch is not None
            and batch_id <= log.last_produce_batch
        ):
            return  # checkpoint replay of an already-applied batch
        base, last = log.append(batch_df, order_by=order_by)
        log.last_produce_batch = int(batch_id)
        log.last_produce_marker = marker_id
        log._write_meta()
        if on_ack is not None and last >= base:
            on_ack(batch_id, base, last)

    writer = source.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
