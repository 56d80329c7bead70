"""Custom stateful streaming operator: gap-based sessionization.

The reference's only stateful stream is the log tail cursor
(internal/server/server.go:138-158 — a per-client offset); user-level
session state is pure extension surface. This is the engine's
demonstration of an operator Structured Streaming does not ship as a
built-in composition: per-key custom state with event-time timeouts
via ``applyInPandasWithState``.

Semantics match the batch twin ``operators.windows.sessionize``
(lag+cumsum): events for one user belong to one session while
consecutive gaps are <= gap_seconds; a session is EMITTED when the
event-time watermark passes its end by the gap (event-time timeout),
i.e. exactly when no in-watermark event can extend it.

Scale posture: state is one (start_us, end_us, n) triple per open
session per user — O(active users), evicted on timeout; the shuffle
key is user_id (same key the batch twin shuffles on). Late events
within the watermark that arrive in the same micro-batch as their
neighbors sessionize exactly; a late event that bridges two
already-emitted sessions is an inherent limit of incremental
sessionization (documented, watermark-bounded).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "user_id LONG, session_start_us LONG, session_end_us LONG, n_events LONG"
_STATE_SCHEMA = "start_us LONG, end_us LONG, n LONG"


def streaming_sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessions: (user_id, session_start_us, session_end_us,
    n_events), emitted once closed (watermark past end + gap)."""
    gap_us = gap_seconds * 1_000_000

    events = stream.select(
        F.col(user_col).cast("long").alias("user_id"), F.col(ts_col).alias("ts")
    ).withWatermark("ts", watermark)

    def sessionize_fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_us": [start_us],
                    "session_end_us": [end_us],
                    "n_events": [n],
                }
            )
            return

        ts_us = pd.concat([pdf["ts"] for pdf in pdf_iter]).astype("int64") // 1000
        ts_us = ts_us.sort_values().to_numpy()

        open_start, open_end, open_n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in ts_us:
            t = int(t)
            if open_start is None:
                open_start, open_end, open_n = t, t, 1
            elif t - open_end > gap_us:
                closed.append((open_start, open_end, open_n))
                open_start, open_end, open_n = t, t, 1
            else:
                open_end, open_n = max(open_end, t), open_n + 1

        state.update((open_start, open_end, open_n))
        # event-time timeout: fire when watermark passes end + gap
        state.setTimeoutTimestamp((open_end + gap_us) // 1000 + 1)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        sessionize_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
