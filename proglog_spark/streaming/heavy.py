"""Streaming heavy-hitter monitor: Misra-Gries summaries as bounded
streaming state.

The batch sketch (`operators/sketch.misra_gries`) answers "which keys
are heavy" from one pass; a pipeline MONITOR needs the same answer
continuously over an unbounded stream — the reference motif is the
tail cursor feeding an aggregation (ConsumeStream,
internal/server/server.go:138-158), and the composition here is what
a training-data ingest monitor actually runs: MG state says WHO is
heavy, the CMS (`events_cms_streamed`) says HOW heavy.

State design (`applyInPandasWithState`): keys are hash-routed to
``groups`` synthetic groups; each group's state is ONE Misra-Gries
summary capped at ``k`` entries, updated per micro-batch with the
classic batched compress (add the batch's counts; past k survivors,
subtract the (k+1)-th largest and drop non-positives). Total state is
``groups × k`` (key, count) pairs NO MATTER how long the stream runs
or how many distinct keys it carries — the property exact per-key
streaming counts (unbounded state) cannot offer.

Guarantees (standard mergeable-summaries analysis, preserved by the
per-batch compress): with N_g the group's total arrivals, every
compress removes ≥ (k+1)·cut mass, so Σ cuts ≤ N_g/(k+1) and each
key's estimate is an undercount by at most N_g/(k+1) ≤ N/(k+1);
any key with true count > N/(k+1) is therefore guaranteed present.
Summary CONTENT is order/batch-boundary-dependent (inherent to MG);
the hash-gated query therefore audits the guarantees — presence and
bounds per exact-heavy key — not the raw summary
(docs_heavy_terms_sketch's pattern, lifted to streaming).

Each batch emits the group's full current summary tagged with a
monotone ``seq``; the monitor's live view (and the post-run final
state) is the max-seq emission per group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from proglog_spark.operators.text import token_hash32

_OUT_SCHEMA = "g LONG, seq LONG, key STRING, est LONG"
_STATE_SCHEMA = "keys ARRAY<STRING>, counts ARRAY<LONG>, seq LONG"


def _compress(counts: pd.Series, k: int) -> pd.Series:
    """The MG step: keep the top ``k`` by (count desc, key asc — a
    DETERMINISTIC tie-break; bare sort_values leaves boundary ties to
    pandas' whim), subtract the (k+1)-th count, drop non-positives."""
    if len(counts) <= k:
        return counts
    order = pd.DataFrame({"key": counts.index, "n": counts.values}).sort_values(
        ["n", "key"], ascending=[False, True]
    )
    cut = int(order["n"].iloc[k])
    kept = order.iloc[:k]
    kept = kept[kept["n"] > cut]
    return pd.Series((kept["n"] - cut).values, index=kept["key"].values)


def streaming_heavy_hitters(
    stream: DataFrame,
    key_col: str,
    k: int = 255,
    groups: int = 8,
) -> DataFrame:
    """MG summaries maintained by the streaming engine. Input: any
    streaming DataFrame with ``key_col``; output (update mode): one
    row per (group, summary entry) per micro-batch —
    ``(g, seq, key, est)``. Downstream keeps the max-seq emission per
    group; the union of the per-group summaries is the corpus summary
    (each key hash-routes to exactly one group, so no cross-group
    merge is needed and the per-group error bound N_g/(k+1) ≤ N/(k+1)
    applies key-wise).
    """
    tagged = stream.select(
        F.col(key_col).cast("string").alias("key"),
        (token_hash32(F.col(key_col).cast("string"), "mg-group") % groups).alias(
            "g"
        ),
    )

    def update_fn(key, pdf_iter, state: GroupState):
        (g,) = key
        if state.exists:
            keys, counts, seq = state.get
            summary = pd.Series(
                list(counts), index=list(keys), dtype="int64"
            )
        else:
            summary, seq = pd.Series(dtype="int64"), 0
        for pdf in pdf_iter:
            vc = pdf["key"].value_counts()
            summary = vc if summary.empty else summary.add(vc, fill_value=0)
            summary = _compress(summary.astype("int64"), k)
        seq += 1
        state.update(
            (list(summary.index), [int(v) for v in summary.values], seq)
        )
        # a NULL-key marker row rides every emission so a batch whose
        # compress EMPTIED the summary (a uniform tail can tie every
        # count at the cut) still registers at this seq — otherwise
        # latest_summaries would fall back to an older batch's rows and
        # report stale state as live
        yield pd.DataFrame(
            {
                "g": [int(g)] * (len(summary) + 1),
                "seq": [seq] * (len(summary) + 1),
                "key": list(summary.index.astype(str)) + [None],
                "est": [int(v) for v in summary.values] + [0],
            }
        )

    return tagged.groupBy("g").applyInPandasWithState(
        update_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        # "append" — the operator re-emits the summary each batch and
        # the downstream max-seq reduction keeps the latest, so every
        # emitted row is final-for-its-seq; Spark requires the operator
        # mode to equal the query's sink mode, and append composes with
        # the memory sink (the sessionize/asof precedent)
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_summaries(emissions: DataFrame) -> DataFrame:
    """Post-run reduction of the accumulated update-mode emissions to
    the final per-group summaries: the max-seq emission per group
    (one batch's emission per group is complete — the whole summary is
    re-emitted each batch)."""
    from pyspark.sql import Window

    # window, not groupBy+self-join: joining a memory-sink table to an
    # aggregate of ITSELF trips Catalyst's conflicting-reference check
    # (the repo's documented self-join ambiguity gotcha), and the
    # emission table is tiny (≤ groups·k rows per batch) anyway
    mx = F.max("seq").over(Window.partitionBy("g"))
    return (
        emissions.withColumn("_mx", mx)
        .where((F.col("seq") == F.col("_mx")) & F.col("key").isNotNull())
        .select("key", "est")
    )
