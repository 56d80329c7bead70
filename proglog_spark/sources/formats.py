"""Interchange format connectors — CSV, JSON-lines, Parquet.

The reference's only wire formats are protobuf frames
(`internal/log/segment.go:49`) and the HTTP JSON edge
(`internal/server/http.go:34,47`); its storage format is the custom
framed store file. Here the storage format is Parquet and these
connectors are the *edges*: landing zones and exports in a pipeline
are routinely CSV / JSON-lines, and a complete engine must read and
write them without giving up Spark's scan discipline.

Scale rules baked in (100 TB posture):

- **Schema is mandatory for text formats.** Schema inference is a
  full extra pass over the data before the real read — never pay it
  on a landing zone. ``read_table`` requires an explicit
  ``StructType`` (or DDL string) for csv/json and refuses to infer.
- **FAILFAST by default.** Silent NULLing of corrupt rows
  (PERMISSIVE) turns data bugs into quality bugs downstream; a
  curation pipeline wants the loud failure. Pass
  ``mode="PERMISSIVE"`` with a ``corrupt_col`` to quarantine
  instead — the canonical dead-letter pattern.
- **Partitioned layout is the pruning unit.** ``write_table``
  accepts ``partition_by``; a reader filter on those columns prunes
  whole directories before any file is opened (asserted in
  `tests/test_formats.py`).
- **Timestamps travel as ISO-8601 micros** (`yyyy-MM-dd
  HH:mm:ss.SSSSSS`) so csv/json round-trips are lossless at the
  engine's µs precision; binary columns must be base64-framed first
  (`sources/json_codec.py` conventions) — CSV has no binary type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_TEXT_FORMATS = ("csv", "json")
# Columnar formats carry their own schema + footer statistics; orc is
# the interchange peer for Hive/Trino-centric estates (predicate
# pushdown and column pruning work the same as parquet — asserted in
# tests/test_formats.py). Parquet stays the native storage format.
_COLUMNAR_FORMATS = ("parquet", "orc")
_FORMATS = _TEXT_FORMATS + _COLUMNAR_FORMATS


def _check_fmt(fmt: str) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {_FORMATS}")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "error",
) -> None:
    """Write ``df`` at ``path`` in ``fmt``, optionally hive-partitioned.

    ``max_records_per_file`` bounds file size (the segment-roll analog,
    `internal/log/segment.go:81-83`) without a repartition: it is a
    writer-side limit, so upstream parallelism is preserved.
    """
    _check_fmt(fmt)
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", "true").option("timestampFormat", TS_FMT)
    elif fmt == "json":
        w = w.option("timestampFormat", TS_FMT)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    mode: str = "FAILFAST",
    corrupt_col: str | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read a table written by ``write_table`` (or any landing zone).

    csv/json REQUIRE ``schema`` — inference is a second full scan and
    is nondeterministic on dirty data. Parquet carries its own schema;
    passing one there just enforces it.
    """
    _check_fmt(fmt)
    if fmt in _TEXT_FORMATS and schema is None:
        raise ValueError(
            f"{fmt} read requires an explicit schema: inference would "
            "scan the data twice and guess types from whatever subset "
            "it sampled"
        )
    r = spark.read.format(fmt).option("mode", mode)
    if merge_schema:
        # schema evolution (parquet only): a landing zone whose
        # producers added columns over time reads as the union schema,
        # older files NULL-filling the new columns. Off by default —
        # merging footers across millions of files costs a driver-side
        # pass, so evolved tables at scale should register the final
        # schema explicitly instead.
        if fmt != "parquet":
            raise ValueError("merge_schema only applies to parquet")
        r = r.option("mergeSchema", "true")
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true").option("timestampFormat", TS_FMT)
    elif fmt == "json":
        r = r.option("timestampFormat", TS_FMT)
    if corrupt_col is not None:
        if mode == "FAILFAST":
            raise ValueError("corrupt_col requires mode='PERMISSIVE'")
        if schema is None:
            raise ValueError("corrupt_col requires an explicit schema")
        # Spark only POPULATES columnNameOfCorruptRecord when the field
        # exists in the user schema — without it the option is a silent
        # no-op and malformed rows read as all-NULL; append it here so
        # the quarantine column always materializes
        from pyspark.sql import types as T

        st = (
            T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
        )
        if corrupt_col not in st.fieldNames():
            st = st.add(corrupt_col, T.StringType())
        r = r.schema(st)
        r = r.option("columnNameOfCorruptRecord", corrupt_col)
    return r.load(path)
