"""Loaders for the driver's parquet fixture tables.

All fixture access goes through ``load_table`` so timestamp
normalization happens exactly once, identically everywhere: the
driver generates ``events.ts`` as parquet TIMESTAMP(NANOS), which
Spark reads as a nanosecond LONG under
``spark.sql.legacy.parquet.nanosAsLong`` — we convert to a
microsecond TIMESTAMP (lossless: fixture values are µs-aligned).

Filters and projections applied by callers still push down to the
parquet scan: the conversion is a single projected column on top of
the file source, and Catalyst prunes unread columns through it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Session-scoped DataFrame HANDLE memo (r11 optimization; the
# queries._memo_df rationale applied to the scan tier): every one of
# the ~200 declared queries calls load_table 1-3 times, and each call
# re-created the parquet reader (footer schema read + a fresh
# unresolved scan subtree the analyzer re-resolves inside every
# consumer plan). Returning the SAME analyzed DataFrame object makes
# Spark skip re-analysis of the scan subtree in every later plan
# (AnalysisHelper's analyzed flag) — measured ~0.05-0.15 s of driver
# build time per query at the suite's fixed floor. No results and no
# .cache() are involved: execution always scans the parquet files,
# clearCache() semantics are untouched, and a new session/app starts
# empty (key includes applicationId).
_HANDLE_MEMO: dict = {}


def clear_handle_memo() -> None:
    """Invalidation hook for :data:`_HANDLE_MEMO` (ADVICE-r11): the
    memo assumes FIXTURE DIRS ARE IMMUTABLE for the session lifetime —
    the parquet reader captures the file listing + footer schema once
    per (session, dir, table). Any harness that regenerates a fixture
    dir in place mid-session must call this first or the old listing
    is served. Not wired into bench cold mode on purpose: handles
    memoize ANALYSIS, never results, so cold attribution is unaffected
    by keeping them."""
    _HANDLE_MEMO.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing types to the engine schema.

    ``events.ts`` is parquet TIMESTAMP(NANOS); depending on the Spark
    version and the ``nanosAsLong`` legacy conf it arrives as either a
    nanosecond LONG (legacy read path) or TIMESTAMP_NTZ (Spark >= 4.1
    native nanos read, truncated to micros). Normalize both to a
    session-TZ TIMESTAMP so downstream epoch arithmetic
    (``unix_micros`` & friends) always sees one type. The session TZ is
    pinned to UTC, so the NTZ→LTZ cast is the identity on epoch values
    and matches DuckDB's ``epoch()`` of the same wall-clock instants.

    Handles are memoized per (application, sf_dir, table) — see the
    module note above; semantics are unchanged (DataFrames are
    immutable and the fixture dirs are read-only).
    """
    # keyed by the SESSION OBJECT, not just applicationId (ADVICE-r11):
    # two SparkSessions in one application share an appId, and a
    # DataFrame is bound to the session that built it — an appId-only
    # key would hand session B a handle that executes on session A.
    # Holding the session strongly is fine: sessions per process are
    # few and the memo dies with the process.
    key = (spark, sf_dir, name)
    memo = _HANDLE_MEMO.get(key)
    if memo is not None:
        return memo
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # nanos → micros MUST be integer division (`div`): epoch-ns
            # values exceed 2^53, so double division would lose microseconds.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    _HANDLE_MEMO[key] = df
    return df


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input is under-split.

    Small fixture tables arrive as one parquet file / one row group,
    which pins every Pandas-UDF stage to a single core. At production
    scale inputs have >= cluster-parallelism partitions and this is a
    no-op (no shuffle added); locally it costs one tiny shuffle and
    buys cores-times speedup on the Python stages.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every fixture as a temp view (for spark.sql access)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
