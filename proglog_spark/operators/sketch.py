"""Mergeable frequency sketches — approximate heavy hitters at scale.

Exact heavy-hitter detection (`events_heavy_users`,
`docs_top_terms`) shuffles one row per distinct key. At 100 TB with a
high-cardinality key (URLs, n-grams, session ids) that shuffle is the
bottleneck; the sketch path bounds state at O(k) per partition and
O(k · partitions) total, shuffling candidate summaries instead of the
key space.

Misra-Gries is chosen over Count-Min here because it is
deterministic (no hash randomness ⇒ reproducible pipelines), purely
additive under merge, and one-sided: estimates NEVER exceed the true
count and undercount by at most N/(k+1) — which makes its guarantee
assertable inside a hash-checked query (`docs_heavy_terms_sketch`).

Merge strategy follows the mergeable-summaries construction
(Agarwal, Cormode, Huang, Phillips, Wei, Yi — PODS'12): combining two
MG(k) summaries = add counts, keep the top k, subtract the (k+1)-th
largest count from the survivors. Any merge tree keeps total
undercount ≤ N/(k+1). Per partition we fold Arrow batches with that
merge (vectorized value_counts, no per-row Python); across partitions
the final combine is a plain ``groupBy(key).sum`` — summing pure
undercounts only ever yields another undercount, so the bound
survives.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries(df: DataFrame, key: str, k: int = 255) -> DataFrame:
    """Approximate per-key counts: ``(key, est)`` with
    ``true - N/(k+1) <= est <= true`` and at most ``k · partitions``
    output rows before the final sum.

    Every key whose true count exceeds N/(k+1) is guaranteed present.
    """
    out_schema = f"{key} string, est long"

    def summarize(batches):
        counts: pd.Series | None = None
        for pdf in batches:
            vc = pdf[key].value_counts()
            counts = vc if counts is None else counts.add(vc, fill_value=0)
            if len(counts) > k:
                # mergeable-summaries step: keep top k, subtract the
                # (k+1)-th count so survivors stay pure undercounts
                counts = counts.sort_values(ascending=False)
                cut = counts.iloc[k]
                counts = counts.iloc[:k] - cut
                counts = counts[counts > 0]
        if counts is None or counts.empty:
            return
        yield pd.DataFrame(
            {key: counts.index.astype(str), "est": counts.values.astype("int64")}
        )

    summaries = df.select(key).mapInPandas(summarize, out_schema)
    return summaries.groupBy(key).agg(F.sum("est").alias("est"))
