"""Custom stateful streaming operator: gap-based sessionization.

The reference's only stateful stream is the log tail cursor
(internal/server/server.go:138-158 — a per-client offset); user-level
session state is pure extension surface. This is the engine's
demonstration of an operator Structured Streaming does not ship as a
built-in composition: per-key custom state with event-time timeouts
via ``applyInPandasWithState``.

Semantics match the batch twin ``operators.windows.sessionize``
(lag+cumsum) for every event the watermark admits: state holds ALL of
a user's sessions that an in-watermark event could still extend or
bridge, merged interval-style with each batch's (sorted) events — so
late events that arrive in a later micro-batch, out of order, or
between two open sessions sessionize exactly. A session is emitted
only once the watermark passes its end by the gap, i.e. when no
admissible event can touch it (events older than the watermark are
dropped by Spark before they reach the state function — the same
boundary).

Scale posture: state is O(sessions within one watermark horizon) per
active user — three parallel long arrays; the shuffle key is user_id
(same key the batch twin shuffles on).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "user_id LONG, session_start_us LONG, session_end_us LONG, n_events LONG"
_STATE_SCHEMA = "starts ARRAY<LONG>, ends ARRAY<LONG>, ns ARRAY<LONG>"


def batch_sessions(ts_us_sorted, gap_us: int) -> list[list[int]]:
    """Vectorized gap-sessionization of one batch's SORTED event times:
    [[start_us, end_us, n_events], ...]. Gap connectivity is
    transitive, so pre-merging a batch's own events into sessions
    before the interval merge cannot change the final result — it
    only shrinks the Python merge loop from O(events) to O(sessions).
    Pure function, property-tested against arbitrary batch splits."""
    import numpy as np

    if not len(ts_us_sorted):
        return []
    brk = np.flatnonzero(np.diff(ts_us_sorted) > gap_us) + 1
    starts = np.concatenate(([0], brk))
    ends = np.concatenate((brk, [len(ts_us_sorted)]))
    return [
        [int(ts_us_sorted[s]), int(ts_us_sorted[e - 1]), int(e - s)]
        for s, e in zip(starts, ends)
    ]


def merge_session_pieces(pieces: list[list[int]], gap_us: int) -> list[list[int]]:
    """Interval-merge session pieces (sorted by start inside): pieces
    within the gap — including overlapping or contained ones — fuse,
    summing event counts. The state function's core; pure so the
    split-invariance property (any partition of events into batches
    converges to the batch twin) is testable without an engine."""
    merged: list[list[int]] = []
    for start, end, n in sorted(pieces):
        if merged and start - merged[-1][1] <= gap_us:
            merged[-1][1] = max(merged[-1][1], end)
            merged[-1][2] += n
        else:
            merged.append([start, end, n])
    return merged


def streaming_sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessions: (user_id, session_start_us, session_end_us,
    n_events), emitted exactly once, once closed (watermark past
    end + gap)."""
    gap_us = gap_seconds * 1_000_000

    # ts_us is computed JVM-side with unix_micros: pandas receives
    # timestamp columns converted to the SESSION time zone and
    # tz-naive, so a Python-side .astype('int64') would be shifted by
    # the zone offset while getCurrentWatermarkMs() stays true epoch —
    # sealing sessions hours late and shifting emitted bounds under
    # any non-UTC session (the same contract anomaly.py follows)
    events = stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
    ).withWatermark("ts", watermark)

    def _timeout_ms(end_us: int) -> int:
        return (end_us + gap_us) // 1000 + 1

    def _emit(user_id, sessions):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start_us": [s[0] for s in sessions],
                "session_end_us": [s[1] for s in sessions],
                "n_events": [s[2] for s in sessions],
            }
        )

    def sessionize_fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        wm_ms = state.getCurrentWatermarkMs()
        old = (
            [list(s) for s in zip(*state.get)] if state.exists else []
        )  # [[start, end, n], ...]

        if state.hasTimedOut:
            new_pieces = []
        else:
            import numpy as np

            ts_us = np.sort(
                pd.concat([pdf["ts_us"] for pdf in pdf_iter]).to_numpy(dtype="int64")
            )
            new_pieces = batch_sessions(ts_us, gap_us)

        # interval merge: existing sessions + new batch sessions (late
        # events can land between, before, or inside open sessions —
        # all handled by the merge)
        merged = merge_session_pieces(old + new_pieces, gap_us)

        # emit everything the watermark has sealed (no admissible event
        # can be within gap of it); keep the rest in state
        done = [s for s in merged if _timeout_ms(s[1]) <= wm_ms]
        live = [s for s in merged if _timeout_ms(s[1]) > wm_ms]

        if live:
            state.update(
                (
                    [s[0] for s in live],
                    [s[1] for s in live],
                    [s[2] for s in live],
                )
            )
            state.setTimeoutTimestamp(min(_timeout_ms(s[1]) for s in live))
        else:
            state.remove()
        if done:
            yield _emit(user_id, done)

    return events.groupBy("user_id").applyInPandasWithState(
        sessionize_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
