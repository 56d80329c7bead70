"""Interchange connectors: CSV / JSON-lines round-trips, mandatory
schemas, dead-letter quarantine, and partition pruning on
hive-partitioned layouts (the directory-level analog of the
reference's segment routing, internal/log/log.go:99-104).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from proglog_spark.plans.audit import executed_plan
from proglog_spark.sources.formats import read_table, write_table
from proglog_spark.sources.tables import load_table


def _events_sample(spark, sf_dir):
    # props carries JSON (commas, quotes, braces) — the hostile case
    # for CSV framing
    return load_table(spark, sf_dir, "events").orderBy("event_id").limit(200)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_text_roundtrip_lossless(spark, sf_dir, tmp_path, fmt):
    e = _events_sample(spark, sf_dir)
    path = str(tmp_path / fmt)
    write_table(e, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=e.schema)
    assert back.schema == e.schema
    assert _rows(back) == _rows(e)


def test_text_read_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path), fmt="csv")


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    e = _events_sample(spark, sf_dir)
    path = str(tmp_path / "part")
    write_table(e, path, fmt="parquet", partition_by=["event_type"])
    # hive layout on disk: one directory per partition value
    dirs = {d for d in os.listdir(path) if d.startswith("event_type=")}
    assert len(dirs) >= 2

    back = read_table(spark, path, fmt="parquet")
    q = back.where(F.col("event_type") == "click")
    plan = executed_plan(q)
    # the partition predicate must prune at the directory index, not
    # ride along as a row-level filter on a full scan
    assert "PartitionFilters" in plan
    assert plan.split("PartitionFilters", 1)[1].splitlines()[0].count("click")
    expected = e.where(F.col("event_type") == "click").drop("event_type")
    assert _rows(q.drop("event_type")) == _rows(expected)


def test_permissive_quarantines_corrupt_rows(spark, tmp_path):
    path = str(tmp_path / "dirty")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.json"), "w") as f:
        f.write('{"k": 1, "s": "good"}\n')
        f.write("{this is not json}\n")
        f.write('{"k": 3, "s": "also good"}\n')
    schema = "k LONG, s STRING, _bad STRING"

    # FAILFAST: loud failure on the corrupt line
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_table(spark, path, fmt="json", schema=schema).collect()

    # PERMISSIVE + corrupt_col: good rows parse, bad row is quarantined
    df = read_table(
        spark, path, fmt="json", schema=schema,
        mode="PERMISSIVE", corrupt_col="_bad",
    )
    rows = df.collect()
    good = {r.k: r.s for r in rows if r._bad is None}
    bad = [r for r in rows if r._bad is not None]
    assert good == {1: "good", 3: "also good"}
    assert len(bad) == 1 and "not json" in bad[0]._bad


def test_corrupt_col_rejects_failfast(spark, tmp_path):
    with pytest.raises(ValueError, match="PERMISSIVE"):
        read_table(
            spark, str(tmp_path), fmt="json", schema="k LONG",
            corrupt_col="_bad",
        )


def test_parquet_schema_evolution_merges_union(spark, tmp_path):
    """Producers added a column over time: mergeSchema reads the union,
    old files NULL-fill; the default read keeps whichever schema the
    footer sample picked (so evolution must be explicit)."""
    path = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "a")], "k LONG, v STRING").write.parquet(path)
    spark.createDataFrame(
        [(2, "b", 99)], "k LONG, v STRING, extra LONG"
    ).write.mode("append").parquet(path)

    merged = read_table(spark, path, fmt="parquet", merge_schema=True)
    assert set(merged.columns) == {"k", "v", "extra"}
    got = {r.k: r.extra for r in merged.collect()}
    assert got == {1: None, 2: 99}

    with pytest.raises(ValueError, match="parquet"):
        read_table(spark, str(tmp_path), fmt="csv", schema="k LONG",
                   merge_schema=True)


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC interchange: lossless round-trip (timestamps at full µs,
    JSON-bearing strings) and the same scan discipline as parquet —
    a selective filter reaches the ORC reader as a pushed predicate."""
    df = _events_sample(spark, sf_dir)
    path = os.path.join(str(tmp_path), "events_orc")
    write_table(df, path, fmt="orc")
    back = read_table(spark, path, fmt="orc")
    assert back.schema == df.schema
    assert _rows(back) == _rows(df)

    plan = executed_plan(back.where(F.col("event_id") == 7).select("event_id", "ts"))
    assert "PushedFilters: [" in plan and "event_id" in plan.split("PushedFilters")[1]


def test_binary_file_ingest(spark, tmp_path):
    """Whole-file byte ingestion (the media landing-zone edge): rows
    are (path, mtime, length, content) with the bytes untouched;
    pathGlobFilter prunes at listing time; metadata filters (length)
    are pushed into the file index so oversized blobs are never
    opened; mapInPandas-side typed metadata extraction composes on
    top (the multimodal plumbing's entry point)."""
    from proglog_spark.multimodal import extract_media_meta
    from proglog_spark.sources.raw import read_binary_files

    d = tmp_path / "blobs"
    d.mkdir()
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    wav = b"RIFF" + b"\x01" * 64
    (d / "a.png").write_bytes(png)
    (d / "b.wav").write_bytes(wav)
    (d / "notes.txt").write_text("not media")

    all_files = read_binary_files(spark, str(d))
    got = {r.name: (r.length, bytes(r.content)) for r in all_files.collect()}
    assert got["a.png"] == (len(png), png)
    assert got["b.wav"] == (len(wav), wav)
    assert len(got) == 3

    only_png = read_binary_files(spark, str(d), glob="*.png")
    assert [r.name for r in only_png.collect()] == ["a.png"]

    # length predicate reaches the binaryFile index (metadata pushdown)
    small = all_files.where(F.col("length") < 45)
    plan = executed_plan(small.select("path", "length"))
    assert "LessThan(length,45)" in plan or "length" in plan.split("PushedFilters")[-1]
    assert {r.name for r in small.collect()} == {"a.png", "notes.txt"}

    # media-meta extraction composes directly on the ingest schema
    meta = extract_media_meta(
        all_files.where(F.col("name") != "notes.txt").select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("content").alias("payload"),
        )
    )
    kinds = {r.header_hex[:8] for r in meta.collect()}
    assert "89504E47" in kinds and "52494646" in kinds


def test_text_lines_and_wholetext(spark, tmp_path):
    """Line-oriented vs one-doc-per-file text ingestion: line mode
    splits big dumps across tasks (the parallel-safe default);
    wholetext yields exactly one row per file; lineSep handles
    NUL-framed exports."""
    from proglog_spark.sources.raw import read_text_lines

    d = tmp_path / "texts"
    d.mkdir()
    (d / "x.txt").write_text("alpha\nbeta\n")
    (d / "y.txt").write_text("gamma\n")

    lines = read_text_lines(spark, str(d))
    assert sorted(r.value for r in lines.collect()) == ["alpha", "beta", "gamma"]

    whole = read_text_lines(spark, str(d), whole=True)
    vals = sorted(r.value for r in whole.collect())
    assert vals == ["alpha\nbeta\n", "gamma\n"]

    nul = tmp_path / "nul"
    nul.mkdir()
    (nul / "z.dat").write_bytes(b"one\x00two\x00three")
    parts = read_text_lines(spark, str(nul), line_sep="\x00")
    assert sorted(r.value for r in parts.collect()) == ["one", "three", "two"]


def test_training_shard_export(spark, sf_dir, tmp_path):
    """Shard sink contract: deterministic key-hash assignment (stable
    across re-exports), hive shard=K/ layout with one writer per
    shard, size balance auditable from footers only, directory-level
    pruning when reading one shard back, and explicit intra-shard
    order."""
    from proglog_spark.sources.shards import (
        assign_shard,
        read_shard,
        shard_stats,
        write_training_shards,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    n_docs = docs.count()
    path = str(tmp_path / "shards")
    write_training_shards(
        docs, path, 4, key_col="doc_id", order_by=["doc_id"]
    )

    stats = shard_stats(spark, path)
    assert [s["shard"] for s in stats] == [0, 1, 2, 3]
    assert sum(s["rows"] for s in stats) == n_docs
    # uniform hash => no shard more than ~2x the smallest at 500 rows
    rows = [s["rows"] for s in stats]
    assert max(rows) <= 2 * max(min(rows), 1)
    assert all(s["files"] == 1 for s in stats)

    # assignment is the declared pure function of the key
    back = spark.read.parquet(path)
    mismatch = back.where(
        F.col("shard") != assign_shard("doc_id", 4)
    ).count()
    assert mismatch == 0

    # re-export is byte-stable on assignment (same key -> same shard)
    path2 = str(tmp_path / "shards2")
    write_training_shards(
        docs.limit(100), path2, 4, key_col="doc_id", order_by=["doc_id"]
    )
    again = spark.read.parquet(path2).select("doc_id", "shard")
    joined = again.alias("a").join(
        back.select("doc_id", "shard").alias("b"), "doc_id"
    )
    assert joined.where("a.shard != b.shard").count() == 0

    # reading one shard prunes the other directories before any file opens
    one = read_shard(spark, path, 2)
    plan = executed_plan(one)
    assert "PartitionFilters" in plan and "shard" in plan
    assert one.count() == stats[2]["rows"]

    # intra-shard training order is the requested one
    got = [r.doc_id for r in one.orderBy(F.monotonically_increasing_id()).collect()]
    assert got == sorted(got)
