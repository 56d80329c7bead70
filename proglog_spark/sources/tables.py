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
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # nanos → micros MUST be integer division (`div`): epoch-ns
            # values exceed 2^53, so double division would lose microseconds.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
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
