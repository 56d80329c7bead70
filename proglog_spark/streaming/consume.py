"""ConsumeStream — tail-follow reads as Structured Streaming.

The reference's ConsumeStream RPC (internal/server/server.go:138-158)
is an unbounded ordered tail: read offset k, k+1, ... and busy-retry
when past the end until new data arrives. The Spark-native
re-expression is a file-source ``readStream`` over the LogTable
directory: every committed append batch becomes newly-discovered
parquet files, each micro-batch is the "new data" the reference's
busy-loop waits for, and the checkpoint replaces the client-held
cursor. Delivery is at-least-once from a given offset with per-batch
ordering — the same contract the reference provides (its busy-wait
gives no cross-batch total order to a slow consumer either; ordering
within a micro-batch is restored by sorting on offset in foreachBatch).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.streaming as S
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proglog_spark.log.table import LogTable


def consume_stream(
    log: LogTable, from_offset: int = 0, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming DataFrame of records with offset >= from_offset.

    The offset predicate prunes whole bucket directories; attach your
    sink via ``writeStream`` (or use ``tail_follow`` for the common
    ordered-callback shape).
    """
    reader = (
        log.spark.readStream.schema(log._full_schema())
        # retention (LogTable.truncate) may delete files this source has
        # already listed; without this a concurrent truncate kills the
        # running query with FileNotFoundException
        .option("ignoreMissingFiles", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(log.path)
    return df.where(
        (F.col("bucket") >= int(from_offset) // log.bucket_size)
        & (F.col("offset") >= int(from_offset))
    ).select("offset", "value", "term", "type")


def tail_follow(
    log: LogTable,
    from_offset: int,
    on_batch: Callable[[list], None],
    checkpoint_dir: str,
    trigger_seconds: float | None = None,
    max_files_per_trigger: int | None = 1000,
) -> S.StreamingQuery:
    """Tail the log, invoking ``on_batch(rows)`` with each micro-batch
    sorted by offset (the reference sends records strictly in offset
    order within its loop; micro-batch boundaries replace loop turns).

    Returns the StreamingQuery; callers stop() it (the reference
    terminates via client context cancellation, server.go:141-145).

    Cursor semantics: an existing checkpoint WINS over ``from_offset``
    — restarting with the same checkpoint_dir resumes after the last
    committed batch (no re-read, no duplicates), exactly like the
    reference's client-held offset surviving a reconnect. Pass a fresh
    checkpoint_dir to re-read from ``from_offset``.

    ``max_files_per_trigger`` (default 1000) bounds the first batch on
    a log with a large backlog — each micro-batch is collect()ed to
    the driver for ``on_batch``, so an unbounded first batch on a big
    log would materialize the whole backlog in driver memory.
    """
    stream = consume_stream(log, from_offset, max_files_per_trigger)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.orderBy("offset").collect()
        if rows:
            on_batch(rows)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
