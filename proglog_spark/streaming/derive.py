"""Derived logs — the consume→transform→produce topology.

The reference's surface stops at one log; every real deployment of a
commit log immediately builds CHAINS on it: a raw topic feeding a
filtered/enriched topic (the Kafka-Streams shape). This operator is
that topology from the engine's own parts, each keeping its contract:

- ``consume_stream`` tails the source LogTable (bucket-pruned file
  source, at-least-once);
- the caller's ``transform`` is any stateless streaming-compatible
  DataFrame function producing ``value[, term[, type]]`` — filters,
  projections, joins against broadcast dims, UDFs; Catalyst fuses it
  into the micro-batch plan;
- ``produce_stream`` appends each micro-batch to the destination
  LogTable under the single-writer invariant with the batch-id replay
  marker, so checkpoint replays do not double-append.

Ordering: destination offsets follow micro-batch arrival; WITHIN each
batch they follow ``order_by`` (typically the source offset carried
through a column — see the test). Across batches the file source
lists new files only, so a source whose offsets grow monotonically
yields a destination in source-offset order; strict global order
under rate-limited pickup would need the cursor-driven delivery of
``tail_follow`` on the produce side too.

State: none beyond the source's streaming checkpoint + the
destination's meta marker. The derived log is itself a LogTable —
chains compose (raw → cleaned → features), each hop independently
restartable and at-least-once.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.streaming as S
from pyspark.sql import DataFrame

from proglog_spark.log.table import LogTable
from proglog_spark.streaming.consume import consume_stream
from proglog_spark.streaming.produce import produce_stream


def derive_log(
    src: LogTable,
    dst: LogTable,
    transform: Callable[[DataFrame], DataFrame],
    checkpoint_dir: str,
    from_offset: int = 0,
    order_by: list[str] | None = None,
    trigger_seconds: float | None = None,
) -> S.StreamingQuery:
    """Continuously materialize ``dst`` as ``transform`` applied to
    ``src``'s records from ``from_offset`` on.

    ``transform`` receives the streaming DataFrame (offset, value,
    term, type) and must return columns ``value[, term[, type]]``;
    carry the source offset into ``term`` (or any long column named in
    ``order_by``) to pin per-batch destination order to source order.
    """
    stream = consume_stream(src, from_offset)
    out = transform(stream)
    return produce_stream(
        out,
        dst,
        checkpoint_dir,
        order_by=order_by,
        trigger_seconds=trigger_seconds,
    )
