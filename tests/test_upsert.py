"""KeyedTable merge-upsert: partial rewrite, idempotence, recovery.

Mirrors the reference test idioms (SURVEY §5): reopen-and-reread
persistence, crash-state recovery, exact content assertions.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from proglog_spark.sources.upsert import BUCKET_COL, KeyedTable


def _mk_base(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("v0-"), "id").alias("val")
    )


def _content(t):
    return {(r.doc_id, r.val) for r in t.df().select("doc_id", "val").collect()}


def test_merge_replaces_and_inserts(spark, tmp_path):
    path = str(tmp_path / "kt")
    t = KeyedTable.create(spark, path, _mk_base(spark), "doc_id", n_buckets=8)
    updates = spark.createDataFrame(
        [(5, "v1-5"), (50, "v1-50"), (150, "v1-150")], "doc_id LONG, val STRING"
    )
    n_rewritten = t.merge(updates)
    assert 1 <= n_rewritten <= 3
    want = {(i, f"v0-{i}") for i in range(100) if i not in (5, 50)}
    want |= {(5, "v1-5"), (50, "v1-50"), (150, "v1-150")}
    assert _content(t) == want
    # reopen-and-reread (new reader over the same path)
    t2 = KeyedTable.open(spark, path, "doc_id", 8)
    assert _content(t2) == want


def test_ordered_merge_keeps_newer_stored_row(spark, tmp_path):
    """merge(order_col=...) compares the CDC sequence against the
    stored row: a LATE change (lower seq arriving in a later batch)
    must not overwrite newer table data, while a genuinely newer
    change still replaces and new keys still insert."""
    path = str(tmp_path / "kt_ord")
    # n_buckets=1: every key shares the touched bucket, so key 4's
    # stored row (NULL seq — a pre-CDC insert) rides through the
    # rewrite untouched and must SURVIVE (max_by skips null ordering
    # values; without a null-total ordering key it would collapse to
    # a NULL row and silently delete the key)
    base = spark.createDataFrame(
        [(1, "new", 7), (2, "x", 3), (4, "keep", None)],
        "doc_id LONG, val STRING, seq LONG",
    )
    t = KeyedTable.create(spark, path, base, "doc_id", n_buckets=1)
    late = spark.createDataFrame(
        [(1, "stale", 5), (2, "y", 4), (3, "z", 1), (5, "malformed", None)],
        "doc_id LONG, val STRING, seq LONG",
    )
    t.merge(late, order_col="seq")
    got = {(r.doc_id, r.val, r.seq) for r in t.df().select("doc_id", "val", "seq").collect()}
    # malformed incoming (NULL seq) is dropped; null-seq STORED row kept
    assert got == {(1, "new", 7), (2, "y", 4), (3, "z", 1), (4, "keep", None)}


def test_merge_leaves_untouched_buckets_alone(spark, tmp_path):
    path = str(tmp_path / "kt")
    t = KeyedTable.create(spark, path, _mk_base(spark), "doc_id", n_buckets=8)

    def bucket_files():
        out = {}
        for d in os.listdir(path):
            if d.startswith(f"{BUCKET_COL}="):
                b = int(d.split("=")[1])
                full = os.path.join(path, d)
                out[b] = {
                    (f, os.path.getmtime(os.path.join(full, f)))
                    for f in os.listdir(full)
                }
        return out

    before = bucket_files()
    updates = spark.createDataFrame([(5, "v1-5")], "doc_id LONG, val STRING")
    touched_bucket = updates.select(
        F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int").alias("b")
    ).first().b
    assert t.merge(updates) == 1
    after = bucket_files()
    for b in before:
        if b != touched_bucket:
            assert after[b] == before[b], f"bucket {b} was rewritten"
    assert after[touched_bucket] != before[touched_bucket]


def test_merge_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "kt")
    t = KeyedTable.create(spark, path, _mk_base(spark, 20), "doc_id", 4)
    updates = spark.createDataFrame(
        [(3, "v1-3"), (21, "v1-21")], "doc_id LONG, val STRING"
    )
    t.merge(updates)
    first = _content(t)
    t.merge(updates)
    assert _content(t) == first


def test_recover_restores_aside_bucket(spark, tmp_path):
    """Crash between 'aside' and 'swap in': the live bucket dir is
    missing and its content sits in .merge-old-<b>; open() restores."""
    path = str(tmp_path / "kt")
    t = KeyedTable.create(spark, path, _mk_base(spark, 20), "doc_id", 4)
    want = _content(t)
    b = next(
        int(d.split("=")[1])
        for d in os.listdir(path)
        if d.startswith(f"{BUCKET_COL}=")
    )
    os.rename(
        os.path.join(path, f"{BUCKET_COL}={b}"),
        os.path.join(path, f".merge-old-{b}"),
    )
    t2 = KeyedTable.open(spark, path, "doc_id", 4)
    assert _content(t2) == want
    # stale aside dirs with a live bucket are dropped
    assert not any(d.startswith(".merge-old") for d in os.listdir(path))

def test_large_batch_merge_drops_broadcast_hint(spark, tmp_path):
    """Above broadcast_row_limit the survivors anti-join must not force
    a broadcast of the update key set (a backfill-sized batch would
    ship GBs to every executor); below/at the limit the hint stays."""
    path = str(tmp_path / "kt")
    t = KeyedTable.create(spark, path, _mk_base(spark, 50), "doc_id", 4)
    t.broadcast_row_limit = 4
    updates = spark.createDataFrame(
        [(i, f"v1-{i}") for i in (1, 2, 3, 60, 61)], "doc_id LONG, val STRING"
    )
    up = updates.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int")
    )
    hinted = t._anti_join_keys(up, n_updates=4)._jdf.queryExecution()
    plain = t._anti_join_keys(up, n_updates=5)._jdf.queryExecution()
    assert "broadcast" in hinted.logical().toString().lower()
    assert "broadcast" not in plain.logical().toString().lower()
    # the over-limit merge itself stays correct end-to-end
    t.merge(updates)
    want = {(i, f"v0-{i}") for i in range(50) if i not in (1, 2, 3)}
    want |= {(i, f"v1-{i}") for i in (1, 2, 3, 60, 61)}
    assert _content(t) == want
