"""Declarative data-quality constraint audit (the Deequ motif).

A 100 TB training-data ingest needs the QA step that blocks a bad
drop BEFORE it poisons downstream dedup/selection: declare constraints
(completeness, uniqueness, value bounds, set membership), compute every
backing metric in ONE aggregation pass over the table, and emit one
verdict row per constraint. The one-pass shape is the point at scale —
N constraints must not mean N scans; Spark computes all metric
aggregates in a single partial-agg tree (map-side combine, one
exchange), exactly like Amazon Deequ's analyzer batching on top of
Spark (public design; re-expressed here as plain DataFrame ops).

Metrics are emitted in micro fixed-point (floor of 1e6 * ratio) per the
repo determinism rules, so verdicts hash identically across engines.

Reference parity: the reference has no data-quality surface at all —
its closest motif is the config-time validation in its server setup
(internal/server/server.go option checks); this generalizes that
fail-loudly posture to data instead of config.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: A constraint: (name, metric aggregate expression (BIGINT, already
#: fixed-point where a ratio), inclusive lower bound or None,
#: inclusive upper bound or None).
Check = tuple[str, Column, "int | None", "int | None"]

MICRO = 1_000_000


def ratio_micro(num: Column, den: Column) -> Column:
    """floor(1e6 * num/den) as BIGINT; NULL-safe (0/0 -> NULL so an
    empty table fails bounded constraints loudly rather than passing
    vacuously — guarded explicitly because ANSI mode turns a bare
    0-denominator into a job-killing DIVIDE_BY_ZERO)."""
    return F.when(den > 0, F.floor(F.lit(MICRO) * num / den)).cast("long")


def completeness_micro(col: Column) -> Column:
    """Fraction of rows with a non-null value, in micros."""
    return ratio_micro(F.count(col), F.count(F.lit(1)))


def uniqueness_micro(col: Column) -> Column:
    """Fraction of rows whose value is distinct-within-the-column, in
    micros (count_distinct / count over non-null rows)."""
    return ratio_micro(F.count_distinct(col), F.count(col))


def membership_micro(col: Column, allowed: tuple[str, ...]) -> Column:
    """Fraction of non-null values inside the allowed set, in micros."""
    return ratio_micro(
        F.count(F.when(col.isin(*allowed), F.lit(1))), F.count(col)
    )


def audit(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run every declared constraint in ONE aggregation pass.

    Returns one row per constraint: (check_name STRING, observed
    BIGINT, passed BOOLEAN). ``passed`` is NULL-strict: a NULL metric
    (empty input) fails any bounded constraint. Output is ordered by
    check_name — a total order, names must be unique."""
    names = [name for name, _, _, _ in checks]
    if len(set(names)) != len(names):
        raise ValueError("constraint names must be unique")
    row = df.agg(
        *[m.cast("long").alias(f"_m{i}") for i, (_, m, _, _) in enumerate(checks)]
    )
    items = []
    for i, (name, _, lo, hi) in enumerate(checks):
        observed = F.col(f"_m{i}")
        ok = observed.isNotNull()
        if lo is not None:
            ok = ok & (observed >= F.lit(int(lo)))
        if hi is not None:
            ok = ok & (observed <= F.lit(int(hi)))
        items.append(
            F.struct(
                F.lit(name).alias("check_name"),
                observed.alias("observed"),
                ok.alias("passed"),
            )
        )
    return (
        row.select(F.explode(F.array(*items)).alias("c"))
        .select("c.check_name", "c.observed", "c.passed")
        .orderBy("check_name")
    )
