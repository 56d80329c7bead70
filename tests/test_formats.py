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
