"""Cluster metadata — the GetServers analog.

The reference exposes cluster membership through the GetServers RPC
(internal/server/server.go:180-186) sourced from Raft configuration
(internal/log/distributed.go:188-202): rows of
``(id, rpc_addr, is_leader)`` with exactly one leader
(api/v1/log.proto:44-48, asserted internal/log/distributed_test.go:74-81).

Spark's driver/executor topology replaces Raft membership; we model
the metadata surface as a small deterministic catalog table so the
declared L11 query remains answerable. The canonical 3-node fixture
mirrors the reference's 3-node test clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CANONICAL_SERVERS = [
    ("node-0", "127.0.0.1:8400", True),
    ("node-1", "127.0.0.1:8401", False),
    ("node-2", "127.0.0.1:8402", False),
]

SERVERS_SCHEMA = "id STRING, rpc_addr STRING, is_leader BOOLEAN"


def validate_servers(servers) -> list:
    """The proto contract check (exactly one leader,
    api/v1/log.proto:44-48) as a standalone step so composition roots
    can reject a bad catalog ONCE at construction instead of every
    request surfacing it as a per-call error."""
    rows = list(servers) if servers is not None else CANONICAL_SERVERS
    leaders = sum(1 for r in rows if r[2])
    if leaders != 1:
        raise ValueError(f"exactly one leader required, got {leaders}")
    return rows


def servers_df(spark: SparkSession, servers=None) -> DataFrame:
    rows = validate_servers(servers)
    # inline VALUES → LocalRelation, entirely JVM-side: a catalog-sized
    # table must never schedule an RDD job (parallelize runs a real
    # task) nor pay the Python→Arrow createDataFrame conversion
    def q(s: str) -> str:
        # escape backslashes FIRST: Spark's default string-literal
        # parsing processes backslash escapes, so a trailing backslash
        # would swallow the closing quote and break the VALUES SQL
        return "'" + str(s).replace("\\", "\\\\").replace("'", "\\'") + "'"

    values = ", ".join(
        f"({q(i)}, {q(a)}, {'true' if l else 'false'})" for i, a, l in rows
    )
    return spark.sql(
        f"SELECT * FROM VALUES {values} AS t(id, rpc_addr, is_leader)"
    )
