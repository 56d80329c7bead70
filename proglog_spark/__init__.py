"""proglog_spark — a PySpark-native event-log analytics engine.

A from-scratch re-expression of the capabilities of the reference
commit-log service (``cdarne/proglog``) on top of Apache Spark:

- ``proglog_spark.log.LogTable`` — an append-only, dense-offset,
  Parquet-backed log table (the Spark equivalent of the reference's
  segmented store+index files; see SURVEY.md §1.3).
- ``proglog_spark.sources`` — loaders for the driver's parquet fixtures.
- ``proglog_spark.operators`` — analytics operators for large-scale
  training-data pipelines (dedup, similarity search, text analysis,
  windowed/top-k aggregation).
- ``proglog_spark.streaming`` — tail-follow consume / produce streams
  (Structured Streaming equivalents of the reference's
  ConsumeStream/ProduceStream RPCs).
- ``proglog_spark.acl`` — allow-list authorization gate (the Casbin
  ACL analog, reference internal/auth/authorizer.go:20-27).

Everything is DataFrame-first: logical plans are declared through the
DataFrame/SQL API and physical strategy is left to Catalyst + AQE.
"""

from proglog_spark.engine import Engine
from proglog_spark.errors import (
    OffsetOutOfRangeError,
    PermissionDeniedError,
    ProglogError,
    WriterLockHeldError,
    WriterLockLostError,
)
from proglog_spark.log import LogTable
from proglog_spark.server import HttpLogServer
from proglog_spark.session import build_session
from proglog_spark.sources.datasource import register_proglog_source

__all__ = [
    "Engine",
    "HttpLogServer",
    "LogTable",
    "OffsetOutOfRangeError",
    "PermissionDeniedError",
    "ProglogError",
    "WriterLockHeldError",
    "WriterLockLostError",
    "build_session",
    "register_proglog_source",
]

__version__ = "0.1.0"
