"""The `format("proglog")` connector: batch parity with the library
scan, offset-filter pushdown (bucket pruning visible as task count),
and the streaming tail cursor with replay determinism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proglog_spark.log import LogTable
from proglog_spark.sources.datasource import register_proglog_source


@pytest.fixture(scope="module")
def served_log(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dsrc") / "log")
    log = LogTable.create(spark, path, bucket_size=8)
    log.append([f"rec-{i}" for i in range(30)])
    register_proglog_source(spark)
    return log, path


def test_batch_read_parity(spark, served_log):
    log, path = served_log
    df = spark.read.format("proglog").option("path", path).load()
    got = [(r.offset, r.value, r.term, r.type) for r in df.orderBy("offset").collect()]
    want = [
        (r.offset, r.value, r.term, r.type) for r in log.reader().collect()
    ]
    assert got == want and len(got) == 30
    assert df.schema.simpleString() == (
        "struct<offset:bigint,value:string,term:bigint,type:int>"
    )


def test_offset_pushdown_prunes_buckets(spark, served_log):
    _, path = served_log
    # 30 records, bucket_size=8 => buckets 0..3. A [10, 20] range
    # touches buckets 1 and 2 only.
    full = spark.read.format("proglog").option("path", path).load()
    assert full.rdd.getNumPartitions() == 4

    ranged = (
        spark.read.format("proglog")
        .option("path", path)
        .option("from_offset", 10)
        .option("to_offset", 20)
        .load()
    )
    assert ranged.rdd.getNumPartitions() == 2  # option-time pruning
    assert ranged.count() == 11

    # WHERE-clause pushdown: the filter is consumed by pushFilters and
    # produces the same pruning + exact results
    filtered = full.where((F.col("offset") >= 10) & (F.col("offset") <= 20))
    rows = sorted(r.offset for r in filtered.collect())
    assert rows == list(range(10, 21))
    assert filtered.rdd.getNumPartitions() == 2

    point = full.where(F.col("offset") == 17)
    assert [r.value for r in point.collect()] == ["rec-17"]
    assert point.rdd.getNumPartitions() == 1

    # non-offset predicates stay in Spark and still apply
    mixed = full.where((F.col("offset") < 8) & (F.col("value") == "rec-3"))
    assert [(r.offset, r.value) for r in mixed.collect()] == [(3, "rec-3")]


def test_stream_tail_cursor(spark, served_log, tmp_path):
    log, path = served_log
    q = (
        spark.readStream.format("proglog")
        .option("path", path)
        .option("from_offset", 25)
        .option("max_batch_records", 4)
        .load()
        .writeStream.format("memory")
        .queryName("pl_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            r.offset for r in spark.sql("SELECT * FROM pl_tail").collect()
        )
        assert got == list(range(25, 30))  # catch-up from the cursor

        log.append(["late-1", "late-2"])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM pl_tail ORDER BY offset").collect()
    finally:
        q.stop()

    offs = [r.offset for r in rows]
    assert offs == list(range(25, 32))  # gap-free, no duplicates
    assert rows[-1].value == "late-2"


def test_stream_cursor_jumps_truncation_gap(spark, tmp_path):
    """A cursor below the lowest surviving offset (after truncation)
    must jump forward instead of stalling on an empty fixed window."""
    path = str(tmp_path / "gap_log")
    log = LogTable.create(spark, path, bucket_size=4)
    log.append([f"g-{i}" for i in range(10)])
    log.truncate(5)  # offsets <= 5 gone; 6..9 survive
    register_proglog_source(spark)

    q = (
        spark.readStream.format("proglog")
        .option("path", path)
        .option("from_offset", 0)
        .option("max_batch_records", 3)  # window [0,2] sees nothing
        .load()
        .writeStream.format("memory")
        .queryName("pl_gap")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(r.offset for r in spark.sql("SELECT * FROM pl_gap").collect())
    finally:
        q.stop()
    assert got == [6, 7, 8, 9]


def test_stream_checkpoint_restart_exactly_once(spark, tmp_path):
    """Kill the stream between micro-batches and restart from the
    checkpoint: the dense-offset cursor + readBetweenOffsets replay
    deliver every record exactly once into a durable sink."""
    path = str(tmp_path / "ck_log")
    log = LogTable.create(spark, path, bucket_size=8)
    log.append([f"a-{i}" for i in range(6)])
    register_proglog_source(spark)

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.format("proglog")
            .option("path", path)
            .option("max_batch_records", 4)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    log.append([f"b-{i}" for i in range(4)])
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(sink).orderBy("offset").collect()
    assert [r.offset for r in rows] == list(range(10))
    assert rows[6].value == "b-0"
