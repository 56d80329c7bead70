"""SparkSession construction with engine-wide defaults.

Centralizes every config the engine depends on for determinism and
scale so tests, the driver entrypoint, and bench.py all run the same
way:

- UTC session timezone (oracle comparisons hash epoch arithmetic).
- ``nanosAsLong`` so the driver's nanosecond-precision parquet
  timestamps are readable (Spark has no TIMESTAMP(NANOS) type); the
  source layer converts them to microsecond timestamps losslessly.
- AQE on (runtime coalescing + skew-join handling — the scale story
  for the 100 TB target; harmless at test scale).
- Arrow enabled for the Pandas-UDF paths (similarity, multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One file per ~64 MB input split at scale; local tests override via
# env. Read at build_session() CALL time, not import time — a test
# that sets SPARK_GRAFT_CPUS after importing the package (monkeypatch,
# late os.environ assignment) must still be honored.


def _env_shuffle_partitions() -> str:
    return os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")


def _env_cpus() -> str:
    return os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_session(
    app_name: str = "proglog_spark",
    master: str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster
    is configured; on a real cluster, leave it unset and submit through
    spark-submit so the cluster manager decides.
    """
    builder = SparkSession.builder.appName(app_name)
    env_master = os.environ.get("SPARK_MASTER_URL")
    if master is not None:
        builder = builder.master(master)
    elif env_master:
        # the env var's VALUE is the master URL — pass it through
        # (merely skipping the local default would crash getOrCreate
        # with 'A master URL must be set' outside spark-submit)
        builder = builder.master(env_master)
    else:
        builder = builder.master(f"local[{_env_cpus()}]")

    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions
            if shuffle_partitions is not None
            else _env_shuffle_partitions()
        ),
        # Driver fixtures store events.ts as parquet TIMESTAMP(NANOS);
        # Spark cannot represent nanos — read as long, convert at source.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # Scale posture: adaptive execution re-plans shuffles at runtime
        # (partition coalescing, skew-join splitting, smarter join picks).
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # AQE coalescing is BYTE-based; stages whose cost is CPU per
        # row on tiny rows (levenshtein pairs, sketch UDFs) serialize
        # when their whole input undercuts the 1 MB default min
        # partition size. 64 KB keeps such stages parallel while still
        # folding genuinely empty partitions (measured: blocked fuzzy
        # match 4 s -> sub-second; no regression on scan-bound
        # queries, which AQE sizes by the 64 MB advisory target).
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
        # Arrow batches for the pandas-UDF slow path (vector ops, media).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Python DataSource filter pushdown (the format("proglog")
        # connector consumes offset predicates for bucket pruning).
        "spark.sql.python.filterPushdown.enabled": "true",
        # Keep partition files bounded — the LogTable "segment roll" knob
        # (reference internal/log/segment.go:81-83 IsMaxed analog).
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.sql.parquet.compression.codec": "snappy",
        # normalize common truthy/falsy spellings: Spark's boolean
        # conf parser rejects "1"/"yes" with an exception at startup
        "spark.ui.enabled": (
            "true"
            if os.environ.get("SPARK_GRAFT_UI", "false").strip().lower()
            in ("1", "true", "yes", "on")
            else "false"
        ),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    # Python workers must be able to import proglog_spark: mapInPandas/
    # pandas_udf closures reference module-level helpers, which pickle
    # BY REFERENCE — the worker re-imports the module. When the driver
    # imported the package from somewhere outside the workers' default
    # sys.path (an external script adding the repo to sys.path), the
    # import dies worker-side with ModuleNotFoundError. Prepending the
    # package's parent dir to PYTHONPATH fixes local-mode workers
    # (spawned from this process's env); on a real cluster, ship the
    # package with --py-files / spark.submit.pyFiles as usual.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    current = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + current if current else "")
        )
    return builder.getOrCreate()
