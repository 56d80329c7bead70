"""Stateful streaming anomaly detection: trailing-window mean flags.

The streaming twin of the batch `events_trailing_anomaly` query: flag
an event whose value exceeds ``mult``× the trailing-window mean for
its key, as the integer cross-multiplication ``vm·n > mult·Σ`` (no
float division — the stream and the batch plan agree bit-for-bit on
ordered feeds, asserted in tests/test_streaming.py).

State design (`applyInPandasWithState`, one state per key):

- the state is the ring of (epoch-µs, value-µs) pairs younger than
  ``window`` relative to the newest event seen — NOT the stream so
  far; arrival rate × window bounds it exactly like a stream-stream
  join's watermark state;
- each micro-batch merges its (sorted) rows with the ring, computes
  per-event trailing count/sum with two binary searches over the
  merged arrays (numpy searchsorted — O(b log(b+r)) per batch), emits
  only flagged rows, and re-trims the ring;
- the RANGE-frame peer rule is preserved: events sharing the exact
  same timestamp see each other's contribution, as in the batch
  window (``side='right'`` on the upper bound);
- unit conversion (ts → epoch µs, value → value µs) happens JVM-side
  BEFORE the Python boundary, so the UDF only ever sees int64 arrays
  (no pandas datetime-resolution ambiguity) and the Arrow batches
  stay narrow.

Ordering contract: per-key event time must not regress across
micro-batches (the tail-follow/file-source case). A regressing event
still gets a correct window against the retained ring but cannot see
entries already trimmed; watermark-late rows should be dropped
upstream (`withWatermark`) if the feed can reorder. Idle keys keep at
most one window's worth of ring (bounded) — no timeout is registered,
because a processing-time timeout keeps the micro-batch trigger hot
even with no data (measured: hundreds of empty batches spinning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = (
    "event_id LONG, event_type STRING, value_micro LONG, "
    "trail_n LONG, trail_sum_micro LONG"
)
STATE_SCHEMA = "tms ARRAY<LONG>, vms ARRAY<LONG>"


def streaming_trailing_anomaly(
    stream: DataFrame,
    window_seconds: int = 21600,
    mult: int = 3,
    min_n: int = 3,
) -> DataFrame:
    """``stream`` needs columns (event_id, event_type, ts, value).
    Returns flagged events as (event_id, event_type, value_micro,
    trail_n, trail_sum_micro) — the batch twin's exact schema.
    """
    window_us = int(window_seconds) * 1_000_000

    def fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        new = pd.concat(list(pdfs))
        if len(new) == 0:
            return
        tm = new["tm"].to_numpy(dtype=np.int64)
        vm = new["vm"].to_numpy(dtype=np.int64)
        ids = new["event_id"].to_numpy(dtype=np.int64)
        order = np.argsort(tm, kind="stable")
        tm, vm, ids = tm[order], vm[order], ids[order]

        if state.exists:
            stms, svms = state.get
            stms = np.asarray(stms, dtype=np.int64)
            svms = np.asarray(svms, dtype=np.int64)
        else:
            stms = np.empty(0, dtype=np.int64)
            svms = np.empty(0, dtype=np.int64)

        all_tm = np.concatenate([stms, tm])
        all_vm = np.concatenate([svms, vm])
        m = np.argsort(all_tm, kind="stable")
        all_tm, all_vm = all_tm[m], all_vm[m]
        csum = np.concatenate([[0], np.cumsum(all_vm)])

        lo = np.searchsorted(all_tm, tm - window_us, side="left")
        hi = np.searchsorted(all_tm, tm, side="right")  # peers included
        n = (hi - lo).astype(np.int64)
        s = csum[hi] - csum[lo]
        flag = (vm * n > mult * s) & (n >= min_n)
        if flag.any():
            yield pd.DataFrame(
                {
                    "event_id": ids[flag],
                    "event_type": key[0],
                    "value_micro": vm[flag],
                    "trail_n": n[flag],
                    "trail_sum_micro": s[flag],
                }
            )

        # >= : the window lower bound is INCLUSIVE (searchsorted
        # side='left' admits equality, matching RANGE PRECEDING), so a
        # boundary entry must survive the trim — a later peer event at
        # exactly newest+window would otherwise miss it vs the batch twin
        keep = all_tm >= all_tm[-1] - window_us
        state.update((all_tm[keep].tolist(), all_vm[keep].tolist()))

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.select(
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("tm"),
            F.floor(F.col("value") * 1_000_000).cast("long").alias("vm"),
        )
        .groupBy("event_type")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
