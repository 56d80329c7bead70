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
single watermark governs them, then grouped into
``applyInPandasWithState``. State holds

- candidates: (key, ts, tie, values...) kept sorted by (ts, tie);
- pending anchors: (key, ts, left_id) awaiting their seal.

An anchor is SEALED — matched and emitted exactly once — when the
watermark passes its timestamp: any still-missing candidate with
``candidate_ts <= anchor_ts`` would by then be older than the
watermark and dropped before reaching the operator, so the match set
is provably complete. The match is the max (ts, tie) candidate with
the same key and ``ts <= anchor_ts`` (ties on ts break on the greater
``tie`` — the exact contract of the batch twin
``operators.joins.asof_join``, whose output the streamed result must
equal for every admitted row).

The state GROUP is a hash BUCKET of keys, not a single key (the
``streaming/heavy.py`` precedent): applyInPandasWithState invokes the
Python function once per state group per micro-batch, so per-key
grouping costs O(|live keys|) interpreter round-trips every batch —
the measured wall at fixture scale (~1500 users ⇒ ~1500 calls/batch)
and a non-starter at 10⁹ keys. With ``n_buckets`` hash groups the
invocation count is O(n_buckets) and the per-key logic vectorizes
INSIDE the bucket: one lexsort per ingest and one ``pd.merge_asof``
(sorted backward search ``by`` key) per seal wave — the same
(ts, tie)-max contract, computed for every key in the bucket at once.

Scale posture: per KEY, candidates older than the watermark are
pruned to the single dominating row (any future anchor has
ts >= watermark and so admits all of them — only the max survives
reachability), so bucket state is O(arrivals within one watermark
horizon) summed over member keys — the same total as per-key
grouping, in n_buckets chunks. The shuffle key is the bucket hash.
Event-time timers wake a bucket exactly when its oldest pending
anchor seals, so emission needs no new arrivals.
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
    n_buckets: int = 64,
) -> DataFrame:
    """As-of join two streams. Returns one row per LEFT (anchor) row:
    ``(key, left_id, left_ts_us, right_ts_us, right_tie, <value_cols>)``
    with NULL right columns when no candidate precedes the anchor.

    ``on``/``left_id``/``tie_break`` must be integral (cast to LONG);
    ``value_cols`` (right-side payload) are carried as DOUBLE. Rows
    older than ``watermark`` on either side are dropped by the engine
    — the same admission boundary the output-equality contract with
    the batch twin is stated over.

    ``n_buckets`` sets the state-group count (keys hash into buckets;
    per-key semantics are vectorized inside each bucket — see module
    docstring). Size it ≈ 2× the executor-core count: invocation cost
    is O(n_buckets) per micro-batch regardless of key cardinality.
    """
    vals = list(value_cols or [])
    out_schema = (
        "key LONG, left_id LONG, left_ts_us LONG, right_ts_us LONG, "
        "right_tie LONG" + "".join(f", {v} DOUBLE" for v in vals)
    )
    state_schema = (
        "c_key ARRAY<LONG>, c_ts ARRAY<LONG>, c_tie ARRAY<LONG>"
        + "".join(f", c_v{i} ARRAY<DOUBLE>" for i in range(len(vals)))
        + ", a_key ARRAY<LONG>, a_ts ARRAY<LONG>, a_id ARRAY<LONG>"
    )
    n_vals = len(vals)

    from proglog_spark.streaming.sessions import NULL_KEY, guarded_null_key

    a = left.select(
        guarded_null_key(F.col(on)).alias("key"),
        F.col(left_time).cast("timestamp").alias("ts"),
        F.lit(0).alias("side"),
        F.col(left_id).cast("long").alias("lid"),
        F.lit(None).cast("long").alias("tie"),
        *[F.lit(None).cast("double").alias(f"v{i}") for i in range(n_vals)],
    )
    # NULL-key semantics follow the batch twin's JOIN rules: a NULL
    # anchor can never match (it rides the NULL_KEY sentinel and seals
    # unmatched, mapping back to NULL on emission) and a NULL candidate
    # can never BE matched (it rides NULL_KEY+1 — a second reserved
    # value no anchor carries, so it never joins; NULL != NULL).
    # Crucially the NULL candidates are NOT filtered out: a pre-
    # watermark filter would exclude their event times from watermark
    # advancement, and a stream whose only late arrivals are NULL-keyed
    # would freeze the clock and never seal pending anchors (caught by
    # test_streaming_asof_matches_batch, whose wm-advancing sentinels
    # happen to read with NULL keys).
    c = right.select(
        guarded_null_key(F.col(on), sentinel=NULL_KEY + 1).alias("key"),
        F.col(right_time).cast("timestamp").alias("ts"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("lid"),
        F.col(tie_break).cast("long").alias("tie"),
        *[F.col(v).cast("double").alias(f"v{i}") for i, v in enumerate(vals)],
    )
    tagged = (
        a.unionByName(c)
        .withColumn("ts_us", F.unix_micros(F.col("ts")))
        .withColumn("bkt", F.pmod(F.col("key"), F.lit(n_buckets)))
        .withWatermark("ts", watermark)
    )

    def asof_fn(key, pdf_iter, state: GroupState):
        yield from _asof_step(key, pdf_iter, state, vals)

    out = tagged.groupBy("bkt").applyInPandasWithState(
        asof_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.withColumn(
        "key",
        F.when(F.col("key") == NULL_KEY, F.lit(None).cast("long")).otherwise(
            F.col("key")
        ),
    )


def _asof_step(key, pdf_iter, state: GroupState, vals: list[str]):
    """One state-machine transition of the as-of join for one BUCKET
    of keys — module-level (not a closure) so the hypothesis model
    test can drive it against a fake GroupState with arbitrary batch
    splits, key→bucket assignments, and watermark schedules, no engine
    required. Yields at most one output frame of sealed-anchor
    matches across every key in the bucket."""
    n_vals = len(vals)
    wm_us = state.getCurrentWatermarkMs() * 1000
    if state.exists:
        st = state.get
        c_key = np.asarray(st[0], dtype=np.int64)
        c_ts = np.asarray(st[1], dtype=np.int64)
        c_tie = np.asarray(st[2], dtype=np.int64)
        c_vals = [np.asarray(x, dtype=np.float64) for x in st[3 : 3 + n_vals]]
        a_key = np.asarray(st[3 + n_vals], dtype=np.int64)
        a_ts = np.asarray(st[4 + n_vals], dtype=np.int64)
        a_id = np.asarray(st[5 + n_vals], dtype=np.int64)
    else:
        c_key = c_ts = c_tie = a_key = a_ts = a_id = np.empty(0, dtype=np.int64)
        c_vals = [np.empty(0, dtype=np.float64) for _ in range(n_vals)]

    # vectorized ingest: bulk-split each Arrow batch by side, then
    # ONE lexsort of the merged candidate arrays per invocation
    # (a per-row insort was the wall at 100k-event scale)
    new_c = False
    if not state.hasTimedOut:
        for pdf in pdf_iter:
            cmask = (pdf["side"].to_numpy() == 1)
            ks = pdf["key"].to_numpy(dtype="int64")
            ts = pdf["ts_us"].to_numpy(dtype="int64")
            if cmask.any():
                c_key = np.concatenate([c_key, ks[cmask]])
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
                a_key = np.concatenate([a_key, ks[amask]])
                a_ts = np.concatenate([a_ts, ts[amask]])
                a_id = np.concatenate(
                    [a_id, pdf["lid"].to_numpy()[amask].astype(np.int64)]
                )
    if new_c and len(c_ts) > 1:
        # GLOBAL (ts, tie) order across the bucket's keys: exactly the
        # sort merge_asof requires (sorted by its `on` column), and
        # within one (key, ts) the max-tie row lands LAST — which is
        # the row a backward merge_asof picks, i.e. the batch twin's
        # tie rule
        order = np.lexsort((c_tie, c_ts))
        c_key, c_ts, c_tie = c_key[order], c_ts[order], c_tie[order]
        c_vals = [v[order] for v in c_vals]

    # seal: watermark strictly past the anchor admits no further
    # candidate at-or-before it (such a row would be late-dropped)
    done_m = a_ts < wm_us

    out = None
    if done_m.any():
        d_key, d_ts, d_id = a_key[done_m], a_ts[done_m], a_id[done_m]
        left = pd.DataFrame(
            {"key": d_key, "left_id": d_id, "ts": d_ts}
        ).sort_values("ts", kind="stable")
        if len(c_ts):
            # merge on a POSITIONAL index, then gather from the int64
            # arrays: merge_asof emits float64 (NaN = no match), and a
            # tie/ts value above 2^53 would lose precision through
            # that round-trip — the index is bounded by the candidate
            # count, so ITS float round-trip is always exact
            right = pd.DataFrame({"key": c_key, "ts": c_ts})
            right["_idx"] = np.arange(len(c_ts), dtype=np.int64)
            m = pd.merge_asof(left, right, on="ts", by="key",
                              direction="backward")
            idx_f = m["_idx"].to_numpy(dtype="float64")
            has = ~np.isnan(idx_f)
            j = np.where(has, idx_f, 0).astype(np.int64)
            cols = {
                "key": m["key"].to_numpy(dtype="int64"),
                "left_id": m["left_id"].to_numpy(dtype="int64"),
                "left_ts_us": m["ts"].to_numpy(dtype="int64"),
                "right_ts_us": pd.Series(c_ts[j]).astype("Int64").mask(~has),
                "right_tie": pd.Series(c_tie[j]).astype("Int64").mask(~has),
            }
            for i, v in enumerate(vals):
                cols[v] = pd.Series(c_vals[i][j]).mask(~has)
        else:  # the bucket never saw a candidate: all NULL matches
            n = len(d_ts)
            cols = {
                "key": left["key"].to_numpy(),
                "left_id": left["left_id"].to_numpy(),
                "left_ts_us": left["ts"].to_numpy(),
                "right_ts_us": pd.Series([None] * n, dtype="Int64"),
                "right_tie": pd.Series([None] * n, dtype="Int64"),
            }
            for v in vals:
                cols[v] = pd.Series([None] * n, dtype="float64")
        out = pd.DataFrame(cols)

    # prune candidates: among those sealed by the watermark only the
    # max (ts, tie) row PER KEY remains reachable by any future anchor
    # (sealed rows form a contiguous prefix of the (ts, tie)-sorted
    # arrays; within it, each key's last occurrence is its max)
    cut = int(np.searchsorted(c_ts, wm_us, side="right"))
    if cut > 1:
        keep_pref = ~pd.Series(c_key[:cut]).duplicated(keep="last").to_numpy()
        if not keep_pref.all():
            keep = np.concatenate(
                [keep_pref, np.ones(len(c_ts) - cut, dtype=bool)]
            )
            c_key, c_ts, c_tie = c_key[keep], c_ts[keep], c_tie[keep]
            c_vals = [v[keep] for v in c_vals]
    a_key, a_ts, a_id = a_key[~done_m], a_ts[~done_m], a_id[~done_m]

    if len(a_ts) or len(c_ts):
        state.update(
            tuple(
                [c_key.tolist(), c_ts.tolist(), c_tie.tolist()]
                + [v.tolist() for v in c_vals]
                + [a_key.tolist(), a_ts.tolist(), a_id.tolist()]
            )
        )
        if len(a_ts):
            # wake exactly when the oldest pending anchor seals
            state.setTimeoutTimestamp(int(a_ts.min()) // 1000 + 1)
    else:
        state.remove()
    if out is not None:
        yield out
