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

Scale posture: the state GROUP is a hash bucket of users (the
`streaming/asof.py` / `streaming/heavy.py` recipe) because
applyInPandasWithState invokes Python once per group per micro-batch
— per-user groups cost O(|live users|) interpreter round-trips per
batch, buckets cost O(n_buckets) with the per-user logic vectorized
inside (one lexsort over the batch, one pass over session PIECES).
Bucket state is O(sessions within one watermark horizon) summed over
member users — four parallel long arrays; the shuffle key is the
user-hash bucket.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "user_id LONG, session_start_us LONG, session_end_us LONG, n_events LONG"
_STATE_SCHEMA = (
    "us ARRAY<LONG>, starts ARRAY<LONG>, ends ARRAY<LONG>, ns ARRAY<LONG>"
)

# NULL keys inside a bucketed state group would reach numpy as NaN and
# crash the int64 ingest (the per-key ancestor passed NULL through as
# its own group). They map to LONG_MIN before bucketing and back to
# NULL on emission — the batch twin's "NULL is its own group" GROUP BY
# semantics, at the documented cost of reserving that one key value
# (the as-of engine additionally reserves NULL_KEY + 1 for NULL-keyed
# CANDIDATES, which under JOIN semantics must never match anything,
# including NULL-keyed anchors).
NULL_KEY = -(1 << 63)


def guarded_null_key(col, sentinel: int = NULL_KEY):
    """NULL→sentinel mapping that fails LOUDLY on sentinel collision.

    The in-band sentinels (LONG_MIN for GROUP-BY-semantics keys,
    LONG_MIN+1 for JOIN-semantics candidates in the as-of engine)
    were previously documented-but-silent: a legitimate key equal to
    -2^63 would be emitted as NULL, a LONG_MIN+1 candidate would
    silently never match, and a LONG_MIN+1 ANCHOR would wrongly match
    NULL-keyed candidates. This guard raises inside the JVM row
    pipeline (``raise_error`` — no extra pass, no shuffle, whole-stage
    codegen keeps it) the moment a REAL key lands anywhere in the
    reserved band {LONG_MIN, LONG_MIN+1} — every engine rejects the
    whole band, not just its own sentinel, because the as-of join
    gives the OTHER value a meaning too. Collision = job failure,
    never a silent remap or phantom match."""
    c = col.cast("long")
    return F.coalesce(
        F.when(
            c <= F.lit(NULL_KEY + 1),
            F.raise_error(
                F.lit(
                    "key lands in the reserved NULL-sentinel band "
                    "{LONG_MIN, LONG_MIN+1}; remap the key domain "
                    "(see streaming/sessions.py NULL_KEY)"
                )
            ),
        ).otherwise(c),
        F.lit(sentinel),
    )


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


def batch_keyed_sessions(users, ts_us, gap_us: int) -> list[list[int]]:
    """Per-key :func:`batch_sessions` over UNSORTED parallel arrays:
    [[user, start_us, end_us, n], ...]. One lexsort by (user, ts),
    breaks where the user changes or the gap exceeds — the multi-key
    twin of the single-key kernel, same transitivity argument."""
    import numpy as np

    users = np.asarray(users, dtype=np.int64)
    ts_us = np.asarray(ts_us, dtype=np.int64)
    if not len(ts_us):
        return []
    order = np.lexsort((ts_us, users))
    u, t = users[order], ts_us[order]
    brk = np.flatnonzero((u[1:] != u[:-1]) | (np.diff(t) > gap_us)) + 1
    starts = np.concatenate(([0], brk))
    ends = np.concatenate((brk, [len(t)]))
    return [
        [int(u[s]), int(t[s]), int(t[e - 1]), int(e - s)]
        for s, e in zip(starts, ends)
    ]


def merge_keyed_pieces(pieces: list[list[int]], gap_us: int) -> list[list[int]]:
    """Keyed :func:`merge_session_pieces`: pieces are
    [user, start, end, n]; rows fuse only within one user. Sorting by
    (user, start) makes each user's pieces contiguous, so the single
    pass is the per-user merge run back to back."""
    merged: list[list[int]] = []
    for user, start, end, n in sorted(pieces):
        if merged and merged[-1][0] == user and start - merged[-1][2] <= gap_us:
            merged[-1][2] = max(merged[-1][2], end)
            merged[-1][3] += n
        else:
            merged.append([user, start, end, n])
    return merged


def streaming_sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    n_buckets: int = 64,
) -> DataFrame:
    """Streaming sessions: (user_id, session_start_us, session_end_us,
    n_events), emitted exactly once, once closed (watermark past
    end + gap).

    State groups are hash BUCKETS of users (``n_buckets``), not single
    users — applyInPandasWithState pays one Python invocation per
    state group per micro-batch, so per-user grouping is O(|live
    users|) interpreter round-trips every batch (a non-starter at
    10⁹ users); bucketed is O(n_buckets), with the per-user logic
    running over the whole bucket at once (`batch_keyed_sessions` one
    lexsort, `merge_keyed_pieces` one pass over session PIECES — a
    count bounded by sessions, not events). Same recipe as
    `streaming/asof.py` and `streaming/heavy.py`."""
    gap_us = gap_seconds * 1_000_000

    # ts_us is computed JVM-side with unix_micros: pandas receives
    # timestamp columns converted to the SESSION time zone and
    # tz-naive, so a Python-side .astype('int64') would be shifted by
    # the zone offset while getCurrentWatermarkMs() stays true epoch —
    # sealing sessions hours late and shifting emitted bounds under
    # any non-UTC session (the same contract anomaly.py follows)
    events = (
        stream.select(
            guarded_null_key(F.col(user_col)).alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        )
        .withColumn("bkt", F.pmod(F.col("user_id"), F.lit(n_buckets)))
        .withWatermark("ts", watermark)
    )

    def sessionize_fn(key, pdf_iter, state: GroupState):
        yield from _sessionize_step(key, pdf_iter, state, gap_us)

    out = events.groupBy("bkt").applyInPandasWithState(
        sessionize_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.withColumn(
        "user_id",
        F.when(F.col("user_id") == NULL_KEY, F.lit(None).cast("long")).otherwise(
            F.col("user_id")
        ),
    )


def _sessionize_step(key, pdf_iter, state: GroupState, gap_us: int):
    """One state transition for one BUCKET of users — module-level so
    model tests can drive it without an engine. State is parallel
    arrays of (user, start, end, n) session pieces; emission seals
    every session the watermark has passed by more than the gap,
    across all users in the bucket at once."""
    wm_ms = state.getCurrentWatermarkMs()
    old = (
        [list(s) for s in zip(*state.get)] if state.exists else []
    )  # [[user, start, end, n], ...]

    if state.hasTimedOut:
        new_pieces = []
    else:
        import numpy as np

        frames = list(pdf_iter)
        users = np.concatenate(
            [p["user_id"].to_numpy(dtype="int64") for p in frames]
        ) if frames else np.empty(0, dtype=np.int64)
        ts_us = np.concatenate(
            [p["ts_us"].to_numpy(dtype="int64") for p in frames]
        ) if frames else np.empty(0, dtype=np.int64)
        new_pieces = batch_keyed_sessions(users, ts_us, gap_us)

    # interval merge per user: existing sessions + new batch sessions
    # (late events can land between, before, or inside open sessions —
    # all handled by the merge)
    merged = merge_keyed_pieces(old + new_pieces, gap_us)

    # emit everything the watermark has sealed (no admissible event
    # can be within gap of it); keep the rest in state
    done = [s for s in merged if _session_timeout_ms(s[2], gap_us) <= wm_ms]
    live = [s for s in merged if _session_timeout_ms(s[2], gap_us) > wm_ms]

    if live:
        state.update(
            (
                [s[0] for s in live],
                [s[1] for s in live],
                [s[2] for s in live],
                [s[3] for s in live],
            )
        )
        state.setTimeoutTimestamp(
            min(_session_timeout_ms(s[2], gap_us) for s in live)
        )
    else:
        state.remove()
    if done:
        yield pd.DataFrame(
            {
                "user_id": [s[0] for s in done],
                "session_start_us": [s[1] for s in done],
                "session_end_us": [s[2] for s in done],
                "n_events": [s[3] for s in done],
            }
        )


def _session_timeout_ms(end_us: int, gap_us: int) -> int:
    return (end_us + gap_us) // 1000 + 1
