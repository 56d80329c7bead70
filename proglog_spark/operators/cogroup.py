"""Cogrouped Arrow apply — per-key alignment of TWO tables in one pass.

Completes the engine's Python-UDF surface (scalar pandas_udf, GROUPED_AGG
UDAF, arrow UDTF, mapInPandas, applyInPandas, applyInPandasWithState —
this is the two-relation member: ``groupBy().cogroup().applyInPandas``).

The shape it earns its keep on: per-entity logic that needs BOTH
relations' rows side by side (order-vs-activity alignment, label
joining against feature history, per-user A/B exposure vs conversion)
where a join would materialize the per-key cross product only to
re-group it. Cogroup shuffles each side once by the key and hands the
two aligned Arrow batches to Python — cross-product-free, and the
per-key pandas work is vectorized.

Scale notes: one hash shuffle per side (same as the join it replaces);
per-key data must fit a task (the usual applyInPandas contract); skew
in the key lands whole keys in one task — pre-split hot keys or fall
back to the JVM formulation (`operators/joins.asof_join`) when a key
can exceed task memory. Parity with the JVM window/join formulation is
pinned in tests/test_operators.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def aligned_activity_stats(
    events: DataFrame,
    orders: DataFrame,
    window_us: int = 3_600_000_000,
) -> DataFrame:
    """Per shared key (events.user_id == orders.o_custkey): how many
    orders were preceded by at least one event within ``window_us``
    (activity-attributed orders), plus both sides' row counts.

    Per key the check is a vectorized merge_asof (sorted backward
    search), not an O(n·m) pairing — the pandas mirror of the engine's
    tagged-union as-of join.
    """
    ev = events.select("user_id", "ts")
    od = orders.select("o_custkey", "o_orderdate")

    def stats(key, ev_pdf: pd.DataFrame, od_pdf: pd.DataFrame) -> pd.DataFrame:
        n_ev, n_od = len(ev_pdf), len(od_pdf)
        if n_od == 0:
            attributed = 0
        elif n_ev == 0:
            attributed = 0
        else:
            od_sorted = od_pdf.sort_values("o_orderdate")
            ev_sorted = ev_pdf.sort_values("ts")
            merged = pd.merge_asof(
                od_sorted,
                ev_sorted.rename(columns={"ts": "ev_ts"}),
                left_on="o_orderdate",
                right_on="ev_ts",
                direction="backward",
            )
            gap = (
                merged["o_orderdate"] - merged["ev_ts"]
            ).dt.total_seconds() * 1_000_000
            attributed = int((gap <= window_us).sum())
        return pd.DataFrame(
            {
                "key": [int(key[0])],
                "n_events": [n_ev],
                "n_orders": [n_od],
                "n_attributed": [attributed],
            }
        )

    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("o_custkey"))
        .applyInPandas(
            stats, "key long, n_events long, n_orders long, n_attributed long"
        )
    )
