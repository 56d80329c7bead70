"""Zero-cost pipeline observability via ``Observation`` metrics.

A 100 TB pipeline needs row counts, null rates, and domain checks on
every stage — but a separate ``df.agg(...)`` per metric re-scans the
stage's input. ``DataFrame.observe`` rides the metrics on the SAME
pass: the aggregates are evaluated inline by the running job and
published when the action finishes, costing zero extra jobs and zero
extra scans.

This wrapper standardizes the engine's audit bundle (rows, per-column
null counts, an optional domain predicate violation count) so sinks
can assert data-quality invariants as they write:

    df, obs = with_audit(df, cols=["user_id"], expect="value >= 0")
    df.write.parquet(out)          # one pass
    audit = obs.get                # {'rows': ..., 'nulls_user_id': ...,
                                   #  'violations': ...}

Caveat (inherent to observe): metrics materialize only after an
ACTION runs the observed node exactly once; a cached/re-used plan
reports the first execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def with_audit(
    df: DataFrame,
    cols: list[str] | None = None,
    expect: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach the standard audit bundle to ``df``.

    Returns ``(observed_df, observation)``; run any action on
    ``observed_df`` (or a plan containing it), then read
    ``observation.get``:

    - ``rows``: rows flowing through this point of the plan,
    - ``nulls_<col>``: NULL count per requested column,
    - ``violations``: rows failing the ``expect`` SQL predicate
      (only when ``expect`` is given).
    """
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in cols or []:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    if expect is not None:
        metrics.append(
            F.sum((~F.expr(expect)).cast("long")).alias("violations")
        )
    obs = Observation()
    return df.observe(obs, *metrics), obs
