"""Raw ingestion sources — whole-file bytes and line-oriented text.

The multimodal path (`proglog_spark/multimodal/`) operates on opaque
``BINARY`` columns with typed metadata. THESE readers are how those
bytes enter the engine from a landing zone: Spark's built-in
``binaryFile`` source turns a directory of image/audio/video blobs
into ``(path, modificationTime, length, content)`` rows without any
decode step, and the ``text`` source turns raw text dumps (one doc
per line, or one doc per file) into rows ready for the curation
operators. The reference's analog is the opaque ``value []byte``
record payload (`/root/reference/api/v1/log.proto:8`): bytes in,
engine never interprets them.

Scale posture (100 TB of media files):

- **File listing is driver-side** — a prefix with millions of tiny
  objects makes listing, not reading, the bottleneck. Prefer fewer,
  larger archive objects upstream, or ingest once into the LogTable
  / parquet (content as BINARY) and never re-list the landing zone.
- **A file never splits.** ``binaryFile`` reads whole files, so one
  5 GB video pins one task. ``spark.sql.sources.binaryFile.maxLength``
  guards against accidental giants (hard cap is the 2 GB array
  limit); partition packing is governed by
  ``spark.sql.files.maxPartitionBytes`` / ``openCostInBytes`` exactly
  as for parquet scans.
- **Predicate pushdown works on metadata.** Filters on ``length``
  and ``modificationTime`` are pushed into the file index — a
  "skip files over 100 MB" guard never opens a single oversized
  blob (asserted in tests/test_formats.py).
- **Glob filtering beats post-filtering.** ``pathGlobFilter``
  prunes at listing time; a ``WHERE path LIKE`` after the scan has
  already paid the read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = False,
    with_name: bool = True,
) -> DataFrame:
    """Read a directory of opaque files as one row per file.

    Schema: ``path STRING, modificationTime TIMESTAMP, length LONG,
    content BINARY`` (the built-in ``binaryFile`` schema), plus a
    derived ``name`` column (basename) when ``with_name`` — the join
    key most media pipelines actually want.

    ``glob`` becomes ``pathGlobFilter`` (listing-time pruning);
    ``recursive`` turns on ``recursiveFileLookup`` (which disables
    hive-style partition discovery, by Spark's rules).
    """
    r = spark.read.format("binaryFile")
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    df = r.load(path)
    if with_name:
        # substring_index: one expression, no per-row segment array,
        # and the separator is a literal (split's is a REGEX)
        df = df.withColumn("name", F.substring_index(F.col("path"), "/", -1))
    return df


def read_text_lines(
    spark: SparkSession,
    path: str,
    *,
    whole: bool = False,
    line_sep: str | None = None,
    glob: str | None = None,
) -> DataFrame:
    """Read raw text: one row per line (default) or per file (whole).

    Schema: ``value STRING``; with ``whole`` each file arrives as a
    single row (the one-document-per-file corpus layout — same
    no-split caveat as ``read_binary_files``). ``line_sep`` overrides
    the default ``\\n`` splitting for e.g. NUL-delimited dumps.
    Line mode splits large files across tasks, so a single giant
    text dump still parallelizes — prefer it whenever documents are
    line-framed.
    """
    r = spark.read.format("text")
    if whole:
        r = r.option("wholetext", "true")
    if line_sep is not None:
        r = r.option("lineSep", line_sep)
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)
