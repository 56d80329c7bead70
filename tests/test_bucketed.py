"""Bucketed layout: the join must be shuffle-free (no Exchange) —
the amortize-the-shuffle-at-write-time posture for 100 TB keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from proglog_spark.sources.bucketed import co_located_join, write_bucketed
from proglog_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_totalprice"
    )
    write_bucketed(e, "b_events", "user_id", 8, sort_by="user_id",
                   path=str(base / "e"))
    write_bucketed(o, "b_orders", "user_id", 8, sort_by="user_id",
                   path=str(base / "o"))
    yield "b_events", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_events")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    """At test scale Catalyst would rather broadcast (also shuffle-free
    but it ignores the layout); pin the big-big path by disabling the
    broadcast threshold — exactly the regime bucketing exists for."""
    lt, rt = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = co_located_join(spark, lt, rt, on="user_id")
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    lt, rt = bucketed_pair
    got = co_located_join(spark, lt, rt, on="user_id").count()
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    want = e.join(o, e.user_id == o.o_custkey).count()
    assert got == want and got > 0


def test_bucketed_groupby_on_key_has_no_exchange(spark, bucketed_pair):
    """The amortization extends to aggregation: groupBy on the bucket
    key needs no shuffle either."""
    lt, _ = bucketed_pair
    df = spark.table(lt).groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
