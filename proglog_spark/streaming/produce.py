"""ProduceStream — streaming appends with per-batch offset assignment.

The reference's ProduceStream RPC (internal/server/server.go:122-136)
is a loop of appends, each acked with its assigned offset. Here a
streaming source feeds ``foreachBatch``, and each micro-batch is
appended to the LogTable under the single-writer invariant — the
batch's dense offset range is the "ack". Exactly-once visibility
comes from the parquet commit + checkpoint pair (the reference's
durability point is the Raft quorum instead; SURVEY.md §3.1).
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
) -> S.StreamingQuery:
    """Append a streaming source (columns value[, term[, type]]) to the
    log; ``on_ack(batch_id, first_offset, last_offset)`` mirrors the
    per-record offset acks of the reference's bidi stream.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        base, last = log.append(batch_df)
        if on_ack is not None and last >= base:
            on_ack(batch_id, base, last)

    writer = source.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
