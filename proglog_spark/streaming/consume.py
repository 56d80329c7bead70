"""ConsumeStream — tail-follow reads as Structured Streaming.

The reference's ConsumeStream RPC (internal/server/server.go:138-158)
is an unbounded ordered tail: read offset k, k+1, ... and busy-retry
when past the end until new data arrives. The Spark-native
re-expression is a file-source ``readStream`` over the LogTable
directory used as a NOTIFICATION channel, plus cursor-driven
authoritative scans for delivery — the same split the reference makes
(its loop holds a client cursor and issues Read(off) against the log
per iteration, server.go:138-158; it never trusts arrival order).

Why not deliver the micro-batch contents directly? Under a rate limit
(``maxFilesPerTrigger``) the file source picks files in listing
order, which is NOT offset order — batches would arrive offset-
interleaved (caught by tests/test_streaming.py's rate-limit test).
Instead each trigger advances a persisted cursor through contiguous
``log.scan(cursor, hi)`` chunks: strict gap-free global offset order,
bounded driver memory per chunk, and at-least-once delivery — a crash
between a delivered chunk and its cursor persist re-delivers that
chunk on restart, exactly the reference's at-least-once reconnect
semantics.
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
    chunk_records: int = 100_000,
) -> S.StreamingQuery:
    """Tail the log, invoking ``on_batch(rows)`` with successive
    contiguous chunks in STRICT offset order (the reference sends
    records strictly in offset order, server.go:152-155; micro-batch
    triggers replace its loop turns).

    Returns the StreamingQuery; callers stop() it (the reference
    terminates via client context cancellation, server.go:141-145).

    Delivery: each trigger reads the newly-observed high offset from
    the micro-batch, then advances a cursor through authoritative
    ``log.scan`` chunks of ≤ ``chunk_records`` rows — never the batch
    contents, whose file-pickup order is not offset order under rate
    limiting. The cursor persists in a sidecar file inside
    ``checkpoint_dir``; restarting with the same checkpoint resumes
    after the last DELIVERED chunk (a crash between delivery and
    persist re-delivers one chunk: at-least-once, the reference's
    reconnect contract). Pass a fresh checkpoint_dir to re-read from
    ``from_offset``. ``max_files_per_trigger`` (default 1000) bounds
    per-trigger file listing work; ``chunk_records`` bounds driver
    memory per delivery.
    """
    import json
    import os

    stream = consume_stream(log, from_offset, max_files_per_trigger)
    cursor_path = os.path.join(checkpoint_dir, "proglog_cursor.json")
    state: dict = {"cursor": None}

    def _load_cursor() -> int:
        try:
            with open(cursor_path) as f:
                return int(json.load(f)["cursor"])
        except Exception:
            return int(from_offset)

    def _persist_cursor(c: int) -> None:
        try:
            os.makedirs(checkpoint_dir, exist_ok=True)
            tmp = cursor_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"cursor": c}, f)
            os.replace(tmp, cursor_path)
        except Exception:
            # non-local checkpoint dir: cursor lives in memory only;
            # a restart re-scans from from_offset on the next trigger
            # (at-least-once, never lossy)
            pass

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if state["cursor"] is None:
            state["cursor"] = _load_cursor()
        hi = batch_df.agg(F.max("offset")).collect()[0][0]
        if hi is None:
            return
        while state["cursor"] <= hi:
            lo = state["cursor"]
            hi_chunk = min(hi, lo + int(chunk_records) - 1)
            rows = log.scan(lo, hi_chunk).collect()
            # deliver only the DENSE PREFIX: offsets are dense by
            # construction, so a shorter-than-expected scan means some
            # file in the range is not yet visible (non-atomic
            # multi-file commit seen out of order). Advancing the
            # cursor past an invisible file would skip its records
            # forever; stop at the first gap and let the next trigger
            # retry — at-least-once, never lossy.
            n_dense = 0
            for r in rows:
                if r.offset != lo + n_dense:
                    break
                n_dense += 1
            rows = rows[:n_dense]
            if rows:
                on_batch(rows)
            if n_dense < hi_chunk - lo + 1:
                if n_dense:
                    state["cursor"] = lo + n_dense
                    _persist_cursor(state["cursor"])
                return
            state["cursor"] = hi_chunk + 1
            _persist_cursor(state["cursor"])

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
