"""The ``records`` log fixture, derived deterministically from ``events``.

The reference's data model is a single record type
``{offset, value, term, type}`` (api/v1/log.proto:7-12) with dense
offsets assigned at append time (internal/log/segment.go:47,62).
The driver pre-registers only the analytics tables, so the declared
log-surface queries (SURVEY.md §2.1 L1–L10) run over a log derived
from ``events``:

- ``offset``  = ``event_id`` (fixture event_ids are dense 0..N-1 —
  verified at data-inspection time — so the density invariant holds
  with no global sort / window, which is the scale-correct choice),
- ``value``   = ``event_type || '|' || props`` (opaque payload analog),
- ``term``    = ``user_id % 7``,
- ``type``    = ``length(event_type)``.

The DuckDB oracle uses the byte-identical CTE below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from proglog_spark.sources.tables import load_table

# Oracle-side twin. Keep in lockstep with records_from_events().
RECORDS_CTE = """
WITH records AS (
  SELECT
    event_id AS "offset",
    event_type || '|' || props AS value,
    user_id % 7 AS term,
    CAST(length(event_type) AS INTEGER) AS type
  FROM events
)
"""


def records_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        F.col("event_id").alias("offset"),
        F.concat(F.col("event_type"), F.lit("|"), F.col("props")).alias("value"),
        (F.col("user_id") % F.lit(7)).alias("term"),
        F.length("event_type").cast("int").alias("type"),
    )
