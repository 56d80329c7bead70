"""End-to-end pipeline recipe tests: each recipe runs whole, the
accounting reconciles with the inputs, and the on-disk layout honors
the shard/split contracts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from proglog_spark.log import LogTable
from proglog_spark.pipelines import (
    curate_and_shard,
    log_to_training_text,
    media_pipeline,
)
from proglog_spark.sources.tables import load_table


def test_curate_and_shard(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars"
    )
    out = str(tmp_path / "curated")
    acct = curate_and_shard(spark, docs, out, n_shards=2)
    rows = acct.collect()
    assert {r.split for r in rows} <= {"train", "valid", "test"}
    assert all(r.n_docs > 0 for r in rows)

    # the export reconciles with the in-plan gate recomputed here
    back = spark.read.option("basePath", out).parquet(
        *[f"{out}/split={s}" for s in ("train", "valid", "test")]
    )
    n_exported = back.count()
    assert n_exported == sum(r.n_docs for r in rows)
    assert n_exported < docs.count()  # the gate dropped something
    # no duplicate texts survive
    assert back.groupBy(F.md5("text")).count().where("count > 1").count() == 0
    # split labels on disk are the deterministic key-hash assignment
    from proglog_spark.operators.sampling import train_split

    relabeled = train_split(
        back.select("doc_id", F.col("split").alias("disk_split")), "doc_id"
    )
    assert relabeled.where("split != disk_split").count() == 0


def test_media_pipeline(spark, tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    png = b"\x89PNG\r\n\x1a\n" + b"\x01" * 40
    (d / "a.png").write_bytes(png)
    (d / "b.png").write_bytes(png)  # exact duplicate content
    (d / "c.wav").write_bytes(b"RIFF" + b"\x02" * 64)

    out = str(tmp_path / "media_shards")
    acct = media_pipeline(spark, str(d), out, n_shards=2)
    rows = acct.collect()
    assert sum(r.n_files for r in rows) == 2  # dupe collapsed

    back = spark.read.parquet(out)
    got = {r.name: r for r in back.collect()}
    # dedup kept the lexicographically-first path of the dupe pair
    assert set(got) == {"a.png", "c.wav"}
    assert got["a.png"].header_hex.startswith("89504E47")
    assert got["c.wav"].n_bytes == 68


def test_log_to_training_text(spark, tmp_path):
    log = LogTable.create(spark, str(tmp_path / "log"), bucket_size=8)
    log.append(["the quick brown fox", "ok", "a longer record with words"])
    out = str(tmp_path / "texts")
    kept = log_to_training_text(spark, log, from_offset=0, out_path=out)
    vals = [r.text for r in kept.collect()]
    # the 1-token record fails the gate
    assert vals == ["the quick brown fox", "a longer record with words"]

    # IDEMPOTENT: a retry (same from_offset) must not duplicate rows
    again = log_to_training_text(spark, log, from_offset=0, out_path=out)
    assert [r.text for r in again.collect()] == vals
    # and an overlapping later slice appends only the new offsets
    log.append(["fresh words arriving now"])
    more = log_to_training_text(spark, log, from_offset=0, out_path=out)
    assert [r.text for r in more.collect()] == vals + ["fresh words arriving now"]

    # incremental consume: only the new tail record (offset 4) joins
    # the three already-curated rows (offsets 0, 2, 3)
    log.append(["another tail record arrives"])
    kept2 = log_to_training_text(spark, log, from_offset=4, out_path=out)
    assert kept2.count() == 4


def test_log_to_training_text_all_gated_first_batch(spark, tmp_path):
    """A first batch where every record fails the gate appends zero
    data files; the read-back must return an empty frame (declared
    schema), not a schema-inference error over an empty directory."""
    log = LogTable.create(spark, str(tmp_path / "log"), bucket_size=8)
    log.append(["no", "x y"])  # all below min_tokens=3
    out = str(tmp_path / "texts")
    kept = log_to_training_text(spark, log, from_offset=0, out_path=out)
    assert kept.count() == 0
    assert kept.columns == ["offset", "text"]
    # later batches still append into the same directory
    log.append(["now a passing record"])
    kept2 = log_to_training_text(spark, log, from_offset=2, out_path=out)
    assert [r.text for r in kept2.collect()] == ["now a passing record"]


def test_curate_and_shard_all_filtered(spark, tmp_path):
    """Thresholds that reject every document yield empty accounting,
    not a schema-inference crash over file-less shard dirs."""
    docs = spark.createDataFrame(
        [(1, "tiny doc", "s", 8), (2, "also small", "s", 10)],
        "doc_id LONG, text STRING, source STRING, n_chars LONG",
    )
    acct = curate_and_shard(
        spark, docs, str(tmp_path / "none"), n_shards=2, min_tokens=50
    )
    assert acct.count() == 0
