"""Arbitrary stateful processing with TIMERS — transformWithState.

`applyInPandasWithState` (used by `streaming/sessions.py` and
`streaming/anomaly.py`) can only act when a key RECEIVES data or when
its group times out wholesale. The transformWithStateInPandas API
(Spark 4) adds what that cannot express: typed state variables
(value/list/map, optional TTL) and **event-time timers** — per-key
callbacks that fire when the WATERMARK passes a deadline, with no new
input for the key at all.

The operator here is the canonical timer shape for an event-log
engine: **inactivity alerts**. Every key keeps its last-seen event
time and an armed timer at ``last_seen + gap``; a new event slides
the timer forward; if the watermark overtakes the deadline first, the
expired-timer callback emits one alert row for the silent key. A
join/window formulation of "tell me when a user went quiet" either
polls (batch re-scans) or waits for the NEXT event that may never
come — the timer is the only construct that fires on absence.

State per key is one long + one timer: O(keys) total, no row
buffering (contrast sessionize, which buffers a session's rows).
Each alert fires once per idle period — arriving again re-arms.

Environment gate: transformWithState's Python worker protocol
requires the ``protobuf`` package at RUNTIME (absent in this
container, so the end-to-end scenario test skips here — the same
import-gated posture as the multimodal decode stubs). Query
construction/analysis is protobuf-free and always tested.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)


class _InactivityProcessor(StatefulProcessor):
    def __init__(self, gap_ms: int):
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._last = handle.getValueState("last_seen", "last_ms long")

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        mx = None
        for pdf in rows:
            batch_max = int(pdf["_ts_ms"].max())
            mx = batch_max if mx is None else max(mx, batch_max)
        if mx is not None:
            prev = self._last.get()
            prev_ms = prev[0] if prev is not None else None
            if prev_ms is None or mx > prev_ms:
                if prev_ms is not None:
                    # slide the armed deadline forward
                    self._handle.deleteTimer(prev_ms + self._gap_ms)
                self._last.update((mx,))
                self._handle.registerTimer(mx + self._gap_ms)
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ):
        last = self._last.get()
        if last is None:  # defensive: timer without state
            return
        yield pd.DataFrame(
            {
                "k": [key[0]],
                "last_seen_ms": [int(last[0])],
                "deadline_ms": [int(expiredTimerInfo.getExpiryTimeInMs())],
            }
        )

    def close(self) -> None:
        pass


def inactivity_alerts(
    stream: DataFrame,
    key_col: str,
    time_col: str,
    gap_seconds: int,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming inactivity monitor: one row per (key, idle period)
    once the watermark passes ``last_event + gap_seconds``.

    Output: ``k`` (the key), ``last_seen_ms``, ``deadline_ms`` —
    epoch millis (the timer API's native granularity). The key is
    cast to LONG explicitly (the declared output schema is ``k long``;
    without the cast a string key would pass groupBy and only crash
    at the FIRST expired timer, killing a long-running query at an
    arbitrary later time)."""
    prepared = stream.withWatermark(time_col, watermark).select(
        F.col(key_col).cast("long").alias("k"),
        F.unix_millis(F.col(time_col).cast("timestamp")).alias("_ts_ms"),
    )
    return prepared.groupBy("k").transformWithStateInPandas(
        statefulProcessor=_InactivityProcessor(gap_seconds * 1000),
        outputStructType="k long, last_seen_ms long, deadline_ms long",
        outputMode="append",
        timeMode="eventTime",
    )
