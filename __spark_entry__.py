"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship curation-pipeline query on
sf0.001; ``queries()`` / ``oracle_sql()`` expose the declared query
surface from ``proglog_spark.queries`` (SURVEY.md §2.1) for the
driver's DuckDB cross-check at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from proglog_spark import queries as q  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _ensure_confs(spark: SparkSession) -> SparkSession:
    """The driver owns the session; set the confs the engine needs
    (safe at runtime — none are static SparkContext configs)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end curation pipeline over the documents
    table — exact dedup → quality gate → benchmark decontamination →
    deterministic train/valid/test split → per-(split, source)
    accounting, composed as ONE Catalyst plan
    (proglog_spark/queries.docs_curation_pipeline)."""
    _ensure_confs(spark)
    return q.docs_curation_pipeline(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2.1 + extensions)."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_confs(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in q.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for every hash-checkable query (see
    proglog_spark/queries.py for the determinism design rules)."""
    return q.oracle_sql()
