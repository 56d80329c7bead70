"""Custom stateful streaming operator: stream-stream AS-OF join.

Structured Streaming ships inner/outer time-BOUNDED stream joins
(streaming/joins.py) but no as-of join — "each left row gets the
LATEST right row at or before it" needs per-key ordered state, not a
bounded interval condition. The reference has nothing comparable
(its only stateful stream is the tail cursor,
internal/server/server.go:138-158); this is north-star extension
surface (e.g. annotating a live event stream with the most recent
order, price, or model-version row per user).

Mechanics (the ``streaming_sessionize`` recipe applied to a join):
both streams are tagged and UNIONED onto one event-time column so a
single watermark governs them, then grouped by key into
``applyInPandasWithState``. State per key holds

- candidates: (ts, tie, values...) kept sorted by (ts, tie);
- pending anchors: (ts, left_id) awaiting their seal.

An anchor is SEALED — matched and emitted exactly once — when the
watermark passes its timestamp: any still-missing candidate with
``candidate_ts <= anchor_ts`` would by then be older than the
watermark and dropped before reaching the operator, so the match set
is provably complete. The match is the max (ts, tie) candidate with
``ts <= anchor_ts`` (ties on ts break on the greater ``tie`` — the
exact contract of the batch twin ``operators.joins.asof_join``, whose
output the streamed result must equal for every admitted row).

Scale posture: candidates older than the watermark are pruned to the
single dominating row (any future anchor has ts >= watermark and so
admits all of them — only the max survives reachability), so state is
O(candidate arrivals within one watermark horizon) + O(pending
anchors within one horizon) per key. The shuffle key is the join key,
same as the batch twin. Event-time timers wake a key exactly when its
oldest pending anchor seals, so emission needs no new arrivals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    left_id: str,
    tie_break: str,
    value_cols: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """As-of join two streams. Returns one row per LEFT (anchor) row:
    ``(key, left_id, left_ts_us, right_ts_us, right_tie, <value_cols>)``
    with NULL right columns when no candidate precedes the anchor.

    ``on``/``left_id``/``tie_break`` must be integral (cast to LONG);
    ``value_cols`` (right-side payload) are carried as DOUBLE. Rows
    older than ``watermark`` on either side are dropped by the engine
    — the same admission boundary the output-equality contract with
    the batch twin is stated over.
    """
    vals = list(value_cols or [])
    out_schema = (
        "key LONG, left_id LONG, left_ts_us LONG, right_ts_us LONG, "
        "right_tie LONG" + "".join(f", {v} DOUBLE" for v in vals)
    )
    state_schema = (
        "c_ts ARRAY<LONG>, c_tie ARRAY<LONG>"
        + "".join(f", c_v{i} ARRAY<DOUBLE>" for i in range(len(vals)))
        + ", a_ts ARRAY<LONG>, a_id ARRAY<LONG>"
    )
    n_vals = len(vals)

    a = left.select(
        F.col(on).cast("long").alias("key"),
        F.col(left_time).cast("timestamp").alias("ts"),
        F.lit(0).alias("side"),
        F.col(left_id).cast("long").alias("lid"),
        F.lit(None).cast("long").alias("tie"),
        *[F.lit(None).cast("double").alias(f"v{i}") for i in range(n_vals)],
    )
    c = right.select(
        F.col(on).cast("long").alias("key"),
        F.col(right_time).cast("timestamp").alias("ts"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("lid"),
        F.col(tie_break).cast("long").alias("tie"),
        *[F.col(v).cast("double").alias(f"v{i}") for i, v in enumerate(vals)],
    )
    tagged = (
        a.unionByName(c)
        .withColumn("ts_us", F.unix_micros(F.col("ts")))
        .withWatermark("ts", watermark)
    )

    def asof_fn(key, pdf_iter, state: GroupState):
        yield from _asof_step(key, pdf_iter, state, vals)

    return tagged.groupBy("key").applyInPandasWithState(
        asof_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _asof_step(key, pdf_iter, state: GroupState, vals: list[str]):
    """One state-machine transition of the as-of join for one key —
    module-level (not a closure) so the hypothesis model test can
    drive it against a fake GroupState with arbitrary batch splits
    and watermark schedules, no engine required. Yields at most one
    output frame of sealed-anchor matches."""
    n_vals = len(vals)
    (k,) = key
    wm_us = state.getCurrentWatermarkMs() * 1000
    if state.exists:
        st = state.get
        c_ts = np.asarray(st[0], dtype=np.int64)
        c_tie = np.asarray(st[1], dtype=np.int64)
        c_vals = [np.asarray(x, dtype=np.float64) for x in st[2 : 2 + n_vals]]
        a_ts = np.asarray(st[2 + n_vals], dtype=np.int64)
        a_id = np.asarray(st[3 + n_vals], dtype=np.int64)
    else:
        c_ts = c_tie = a_ts = a_id = np.empty(0, dtype=np.int64)
        c_vals = [np.empty(0, dtype=np.float64) for _ in range(n_vals)]

    # vectorized ingest: bulk-split each Arrow batch by side, then
    # ONE lexsort of the merged candidate arrays per invocation
    # (a per-row insort was the wall at 100k-event scale)
    new_c = False
    if not state.hasTimedOut:
        for pdf in pdf_iter:
            cmask = (pdf["side"].to_numpy() == 1)
            ts = pdf["ts_us"].to_numpy(dtype="int64")
            if cmask.any():
                c_ts = np.concatenate([c_ts, ts[cmask]])
                c_tie = np.concatenate(
                    [c_tie, pdf["tie"].to_numpy()[cmask].astype(np.int64)]
                )
                for i in range(n_vals):
                    c_vals[i] = np.concatenate(
                        [
                            c_vals[i],
                            pdf[f"v{i}"].to_numpy()[cmask].astype(np.float64),
                        ]
                    )
                new_c = True
            amask = ~cmask
            if amask.any():
                a_ts = np.concatenate([a_ts, ts[amask]])
                a_id = np.concatenate(
                    [a_id, pdf["lid"].to_numpy()[amask].astype(np.int64)]
                )
    if new_c and len(c_ts) > 1:
        order = np.lexsort((c_tie, c_ts))  # by (ts, tie)
        c_ts, c_tie = c_ts[order], c_tie[order]
        c_vals = [v[order] for v in c_vals]

    # seal: watermark strictly past the anchor admits no further
    # candidate at-or-before it (such a row would be late-dropped)
    done_m = a_ts < wm_us

    out = None
    if done_m.any():
        d_ts, d_id = a_ts[done_m], a_id[done_m]
        cols = {
            "key": np.full(len(d_ts), k, dtype=np.int64),
            "left_id": d_id,
            "left_ts_us": d_ts,
        }
        if len(c_ts):
            # rightmost candidate with ts <= anchor ts: 'right'
            # lands past every equal-ts candidate, and (ts, tie)
            # ordering makes index-1 the max-tie one — the batch
            # twin's tie rule
            idx = np.searchsorted(c_ts, d_ts, side="right")
            has = idx > 0
            j = np.maximum(idx - 1, 0)
            cols["right_ts_us"] = pd.Series(c_ts[j]).astype("Int64").mask(~has)
            cols["right_tie"] = pd.Series(c_tie[j]).astype("Int64").mask(~has)
            for i, v in enumerate(vals):
                cols[v] = pd.Series(c_vals[i][j]).mask(~has)
        else:  # this key never saw a candidate: all NULL matches
            n = len(d_ts)
            cols["right_ts_us"] = pd.Series([None] * n, dtype="Int64")
            cols["right_tie"] = pd.Series([None] * n, dtype="Int64")
            for v in vals:
                cols[v] = pd.Series([None] * n, dtype="float64")
        out = pd.DataFrame(cols)

    # prune candidates: among those sealed by the watermark only
    # the max (ts, tie) row remains reachable by any future anchor
    cut = int(np.searchsorted(c_ts, wm_us, side="right"))
    if cut > 1:
        c_ts, c_tie = c_ts[cut - 1 :], c_tie[cut - 1 :]
        c_vals = [v[cut - 1 :] for v in c_vals]
    a_ts, a_id = a_ts[~done_m], a_id[~done_m]

    if len(a_ts) or len(c_ts):
        state.update(
            tuple(
                [c_ts.tolist(), c_tie.tolist()]
                + [v.tolist() for v in c_vals]
                + [a_ts.tolist(), a_id.tolist()]
            )
        )
        if len(a_ts):
            # wake exactly when the oldest pending anchor seals
            state.setTimeoutTimestamp(int(a_ts.min()) // 1000 + 1)
    else:
        state.remove()
    if out is not None:
        yield out
