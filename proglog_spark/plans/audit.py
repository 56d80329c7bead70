"""Plan audits — programmatic access to the physical-plan facts that
decide whether a query survives a 100× scale-up.

The reference's physical layer has exactly two scale tricks: the mmap
offset index and segment-range routing (internal/log/index.go:40-66,
log.go:99-104). Their Spark equivalents — predicate pushdown, column
pruning, broadcast vs shuffle joins, shuffle counts — are visible only
in the executed plan, so this module turns them into assertable
values. ``tests/test_plans.py`` pins shapes with these; library users
can audit their own compositions the same way before pointing them at
a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SHUFFLE_MARKER = "Exchange hashpartitioning"


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (post-AQE initial plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    """The Catalyst-optimized logical plan string."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters: [...]`` block content, one per scan —
    empty strings mean a scan with nothing pushed."""
    plan = executed_plan(df)
    out = []
    for chunk in plan.split("PushedFilters: [")[1:]:
        # the block ends at the line end (or the next plan field), and
        # may contain nested ']' (e.g. In(col, [1,2,3])) — splitting at
        # the first ']' would truncate the list
        line = chunk.splitlines()[0]
        for stop in (", ReadSchema:", ", PartitionFilters:", ", DataFilters:"):
            if stop in line:
                line = line.split(stop)[0]
        out.append(line.rstrip().rstrip("]"))
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Every scan's ``ReadSchema`` struct string — the columns that
    actually leave the parquet reader (pruning audit)."""
    plan = executed_plan(df)
    return [chunk.splitlines()[0].strip() for chunk in plan.split("ReadSchema:")[1:]]


def count_shuffles(df: DataFrame) -> int:
    """Number of hash-partition exchanges (the shuffles that grow
    linearly in cost with data volume). Broadcast and range exchanges
    are counted separately by callers if they care."""
    return executed_plan(df).count(SHUFFLE_MARKER)


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise AssertionError (with the plan) if any hash shuffle
    exists — the co-located/bucketed invariant."""
    plan = executed_plan(df)
    if SHUFFLE_MARKER in plan:
        raise AssertionError(f"expected shuffle-free plan, got:\n{plan}")
