"""Engine facade: the Agent-analog composition root — RPC surface with
ACL enforcement in front of every call (server.go:100-120 wiring)."""

from __future__ import annotations

import pytest

from proglog_spark import Engine, OffsetOutOfRangeError, PermissionDeniedError


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine.create(spark, str(tmp_path / "log"), bucket_size=8)


def test_produce_consume_roundtrip_and_bounds(engine):
    first, last = engine.produce("root", ["a", "b", "c"])
    assert (first, last) == (0, 2)
    assert engine.consume("root", 1).value == "b"
    assert (engine.lowest_offset(), engine.highest_offset()) == (0, 2)
    got = [(r.offset, r.value) for r in engine.consume_from("root", 1).collect()]
    assert got == [(1, "b"), (2, "c")]


def test_acl_denies_unauthorized_subjects(engine):
    with pytest.raises(PermissionDeniedError):
        engine.produce("nobody", ["x"])
    with pytest.raises(PermissionDeniedError):
        engine.consume("nobody", 0)
    # denial happens BEFORE the log is touched
    assert engine.highest_offset() is None


def test_out_of_range_surfaces_typed_error(engine):
    engine.produce("root", ["a"])
    with pytest.raises(OffsetOutOfRangeError) as e:
        engine.consume("root", 99)
    assert "99" in e.value.canonical()


def test_truncate_gated_on_produce(engine):
    engine.produce("root", ["a", "b", "c"])
    with pytest.raises(PermissionDeniedError):
        engine.truncate("nobody", 1)
    engine.truncate("root", 1)
    assert engine.lowest_offset() == 2


def test_sql_entry_over_registered_views(engine):
    engine.produce("root", ["a", "b", "c"])
    row = engine.sql(
        "SELECT count(*) AS n, max(offset) AS hi FROM records"
    ).first()
    assert (row.n, row.hi) == (3, 2)
    assert engine.sql("SELECT count(*) AS n FROM servers").first().n == 3
    with pytest.raises(PermissionDeniedError):
        engine.sql("SELECT 1", subject="nobody")


def test_reopen_recovers(spark, tmp_path):
    e1 = Engine.create(spark, str(tmp_path / "log"), bucket_size=8)
    e1.produce("root", ["a", "b"])
    e2 = Engine.open(spark, str(tmp_path / "log"))
    assert e2.highest_offset() == 1 and e2.consume("root", 0).value == "a"


def test_engine_streaming_tail_gated_and_live(engine, tmp_path):
    """The facade's streaming consume enforces the ACL and delivers
    post-subscription appends (the O21 liveness contract)."""
    with pytest.raises(PermissionDeniedError):
        engine.consume_stream("nobody")
    engine.produce("root", ["a", "b"])
    seen = []
    q = engine.tail_follow(
        "root", 0, lambda rows: seen.extend(r.value for r in rows),
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        engine.produce("root", ["c"])
        q.processAllAvailable()
    finally:
        q.stop()
    assert seen == ["a", "b", "c"]


def test_register_analytics_views_spans_full_catalog(spark, sf_dir, tmp_path):
    """engine.sql over log + metadata + analytics fixtures in one
    catalog after register_analytics_views."""
    from proglog_spark.engine import Engine

    eng = Engine.create(spark, str(tmp_path / "cat_log"), bucket_size=8)
    eng.produce("root", ["a", "b"])
    names = eng.register_analytics_views(sf_dir)
    assert "events" in names and "documents" in names
    out = eng.sql(
        "SELECT (SELECT count(*) FROM records) AS n_records, "
        "(SELECT count(*) FROM events) AS n_events, "
        "(SELECT count(*) FROM documents) AS n_docs"
    ).collect()[0]
    assert out.n_records == 2 and out.n_events > 0 and out.n_docs > 0

    import pytest as _pytest

    from proglog_spark.errors import PermissionDeniedError

    with _pytest.raises(PermissionDeniedError):
        eng.register_analytics_views(sf_dir, subject="nobody")


def test_sql_parameter_binding(spark, tmp_path):
    """Parameterized engine.sql: named and positional binding carry
    values as plan literals (injection-safe), equivalent to inlining."""
    from proglog_spark.engine import Engine

    eng = Engine.create(spark, str(tmp_path / "param_log"), bucket_size=8)
    eng.produce("root", [f"v{i}" for i in range(10)])

    named = eng.sql(
        'SELECT count(*) AS n FROM records WHERE offset >= :lo AND offset <= :hi',
        args={"lo": 2, "hi": 5},
    ).collect()[0]
    assert named.n == 4

    positional = eng.sql(
        "SELECT value FROM records WHERE offset = ? ORDER BY offset",
        args=[7],
    ).collect()
    assert [r.value for r in positional] == ["v7"]

    # a hostile "value" stays a literal, not SQL
    hostile = eng.sql(
        "SELECT count(*) AS n FROM records WHERE value = :v",
        args={"v": "v1' OR '1'='1"},
    ).collect()[0]
    assert hostile.n == 0

def test_sql_respects_caller_subject_without_root_grant(spark, tmp_path):
    """engine.sql must authorize THE CALLER only: under a policy with
    no 'root' grant, an authorized subject's SQL still runs (the
    servers view registration must not re-authorize as root)."""
    from proglog_spark.engine import Engine

    path = str(tmp_path / "aclsql")
    engine = Engine.create(
        spark, path, bucket_size=8, policy=[("alice", "*", "consume")]
    )
    out = engine.sql(
        "SELECT count(*) AS n FROM servers", subject="alice"
    ).collect()
    assert out[0].n == 3
