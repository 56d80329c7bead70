"""Training-shard export — the sink at the end of a curation pipeline.

After dedup → quality gates → decontamination → split → packing, the
corpus leaves the engine as N shards a trainer's data loader streams
independently. The reference's analog is the segment roll
(`/root/reference/internal/log/segment.go:81-83` — bound every file's
size so consumers can stream units of known cost); here the contract
is stronger and trainer-specific:

- **Deterministic assignment.** A document's shard is a pure function
  of its key (xxhash64 mod N — same family as `operators/sampling`),
  never of partitioning accidents, so re-exports are reproducible,
  incremental appends land in the same shard, and a given shard can
  be re-built alone.
- **Size balance.** Uniform key-hash spreads rows evenly; the audit
  (`shard_stats`) proves it from parquet footers at metadata cost.
- **Directory-per-shard layout** (hive `shard=K/`): a loader reads
  its shard by path; engine-side readers get partition pruning on the
  shard column for free.
- **Intra-shard order** is explicit (`order_by`), because loaders
  that stream sequentially turn file order into training order —
  leave it to chance and you train on partitioning noise.

Scale posture: one hash shuffle on the shard id (repartition by the
assignment column so each shard is written by the tasks that own it,
not appended to by every task — a 1000-executor export writes
`n_shards` × 1 files, not `n_shards` × 1000). For multi-TB shards
raise ``maxRecordsPerFile`` ceilings instead of shard count; the
shard stays one directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHARD_COL = "shard"


def assign_shard(key_col, n_shards: int, salt: str = "shard"):
    """Deterministic shard id in [0, n_shards) from the row key."""
    from proglog_spark.operators.text import token_hash32

    return (token_hash32(F.col(key_col).cast("string"), salt) % n_shards).cast(
        "int"
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    *,
    key_col: str,
    order_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    salt: str = "shard",
    extra_partition_cols: list[str] | None = None,
    num_write_partitions: int | None = None,
) -> None:
    """Export ``df`` as ``n_shards`` hive directories ``shard=K/``.

    One shuffle: rows are repartitioned by their (deterministic)
    shard id so every shard directory is produced by the partition
    that owns it. ``order_by`` sorts within the shard (training
    order); ``max_records_per_file`` bounds individual file sizes
    inside a shard without changing the shard count.

    ``extra_partition_cols``: hive partition columns written AHEAD of
    the shard (``.../split=train/shard=3/``) in the SAME single write
    — a caller looping over split values would pay one full shuffle +
    sort per split for the identical layout.
    ``num_write_partitions`` sizes that combined shuffle (default
    n_shards, or n_shards x 4 when extra columns multiply the
    directory count).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    extra = list(extra_partition_cols or [])
    out = df.withColumn(SHARD_COL, assign_shard(key_col, n_shards, salt))
    # repartitionByRange over the dense 0..n-1 shard ids: hash
    # repartition would collide distinct shard ids into one task
    # (pmod(hash(id), n) is not identity) leaving other tasks empty —
    # range partitioning gives ~one shard per task at full parallelism
    p = num_write_partitions or (n_shards * 4 if extra else n_shards)
    out = out.repartitionByRange(p, *extra, SHARD_COL)
    if order_by:
        # the partition columns must LEAD the sort: the
        # dynamic-partition writer requires output ordered by them and
        # would insert its own sort over ours (losing the training
        # order whenever that sort spills, and paying a second sort);
        # with the prefix satisfied the writer reuses this ordering
        out = out.sortWithinPartitions(*extra, SHARD_COL, *order_by)
    w = out.write.mode("overwrite")
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.partitionBy(*extra, SHARD_COL).parquet(path)


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One shard, loaded with directory-level pruning (the filter on
    the hive partition column never opens other shards' files)."""
    return spark.read.parquet(path).where(F.col(SHARD_COL) == shard)


def shard_stats(spark: SparkSession, path: str) -> list[dict]:
    """Per-shard (rows, bytes, files) from parquet footers only — the
    balance audit, at metadata cost (no data read). Mirrors
    ``LogTable.files()``."""
    import pyarrow.parquet as pq

    stats: dict[int, dict] = {}
    for entry in sorted(os.listdir(path)):
        if not entry.startswith(f"{SHARD_COL}="):
            continue
        shard = int(entry.split("=", 1)[1])
        s = stats.setdefault(
            shard, {"shard": shard, "rows": 0, "bytes": 0, "files": 0}
        )
        d = os.path.join(path, entry)
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(d, fn)
            meta = pq.read_metadata(fp)
            s["rows"] += meta.num_rows
            s["bytes"] += os.path.getsize(fp)
            s["files"] += 1
    return [stats[k] for k in sorted(stats)]
