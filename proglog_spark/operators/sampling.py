"""Deterministic sampling — stable subsets for training-data pipelines.

Spark's ``df.sample``/``sampleBy`` draw from a seeded RNG whose output
depends on partitioning, so the "same" sample changes when the input
is repartitioned, compacted, or re-scaled — unacceptable when the
sample feeds a training run that must be reproducible and joinable.
These operators decide membership from a hash of the ROW KEY instead:

- the same row is in or out forever, at any scale, any partitioning;
- two tables sampled with the same salt stay join-consistent (a doc
  and its embedding fall on the same side);
- widening the rate from 10% to 20% keeps the original 10% (nested
  samples by construction: ``hash < a`` ⊂ ``hash < b`` for a ≤ b).

The hash is the repo-wide cross-engine convention (first 8 hex digits
of md5 → int, operators/text.token_hash32), so every sample here is
oracle-checkable in DuckDB — no RNG parity problems. All membership
logic is JVM-side expression work: a sample is a pushable filter or a
per-stratum window, never a UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from proglog_spark.operators.text import token_hash32

HASH_SPACE = 1_000_000


def hash_bucket(key_col, salt: str = "") -> "F.Column":
    """Uniform bucket in [0, 1e6) from the row key — micro-fraction
    space, matching the repo's fixed-point ratio convention.

    NULL keys hash via an explicit sentinel, so every operator in this
    family treats them the SAME deterministic way (a bare hash of NULL
    is NULL, which would make hash_sample silently DROP null-key rows
    at any rate while train_split routed them to 'test' — three
    inconsistent behaviors across advertised join-consistent ops)."""
    keyed = F.coalesce(key_col.cast("string"), F.lit("\x00<null>"))
    return token_hash32(keyed, salt) % HASH_SPACE


def hash_sample(
    df: DataFrame, key_col: str, fraction_micro: int, salt: str = "s"
) -> DataFrame:
    """Keep rows whose key hashes below ``fraction_micro``/1e6.

    A plain filter — no shuffle, no RNG, prunes at the scan when the
    planner can. Samples at different rates with the same salt nest.
    """
    return df.where(hash_bucket(F.col(key_col), salt) < fraction_micro)


def train_split(
    df: DataFrame,
    key_col: str,
    train_micro: int = 800_000,
    valid_micro: int = 900_000,
    salt: str = "split",
) -> DataFrame:
    """Assign every row a deterministic train/valid/test split label.

    The assignment is a pure function of the row key (same hash as
    ``hash_sample``), so it is reproducible across runs, stable under
    repartitioning/compaction, and join-consistent across tables keyed
    by the same id — the properties a dataset split must have before a
    training run depends on it. Pure projection: no shuffle, no RNG.

    The default salt is DISTINCT from hash_sample's ("split" vs "s"):
    with a shared salt, any sample at rate <= train_micro would consist
    exclusively of 'train' rows — composing the two operators with
    defaults silently emptied the valid/test splits.
    """
    b = hash_bucket(F.col(key_col), salt)
    return df.withColumn(
        "split",
        F.when(b < train_micro, F.lit("train"))
        .when(b < valid_micro, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    key_col: str,
    salt: str = "s",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen as the
    k smallest (hash, key) — deterministic, and balanced across
    strata regardless of how skewed the strata sizes are (the
    rebalancing step after a skewed-source crawl).

    One hash shuffle on the strata columns; rank ties are impossible
    because the key is unique. Output carries ``sample_rank`` (1-based
    hash-order rank within the stratum).
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= k)
    )


def mixture_rates(
    col, rates: dict[str, int], default_micro: int
) -> "F.Column":
    """Per-group sampling rate (micro) as a CASE chain: the declared
    mixture recipe ("keep 80% of src0, 40% of src1, 10% of the rest")
    expressed as a pure column — deterministic, broadcast-free."""
    expr = F.lit(default_micro)
    for k in sorted(rates, reverse=True):
        expr = F.when(col == k, F.lit(int(rates[k]))).otherwise(expr)
    return expr


def mixture_sample(df, key_col: str, rate_micro, salt: str = "mix"):
    """Weighted mixture sampling: keep each row iff its key hash falls
    below the row's own target rate. Same key-hash membership as
    ``hash_sample`` (stable, join-consistent, nested: raising a
    source's rate only ADDS documents), so re-weighting a 100 TB
    mixture is a metadata change plus one filter scan — no shuffle,
    no RNG, reproducible across runs and cluster sizes."""
    return df.where(hash_bucket(F.col(key_col), salt) < rate_micro)


def epoch_shuffle_key(key_col, epoch: int, salt: str = "shuffle") -> "F.Column":
    """Deterministic per-epoch shuffle key for training-order
    randomization: hash(key, epoch) — every epoch is an independent
    pseudorandom permutation of the corpus, reproducible across runs
    and stable under repartitioning (the property an interrupted
    training run needs to resume mid-epoch at the right position).
    Order by (this key, row key) for a total order; pure projection,
    no RNG state. NULL keys use the family's shared sentinel."""
    keyed = F.coalesce(key_col.cast("string"), F.lit("\x00<null>"))
    return token_hash32(keyed, f"{salt}:{epoch}:")


#: Per-key ticket cap for ppswor_bottom_k: the ticket array for one
#: key materializes in ONE row before the explode, so this bounds a
#: single row's memory at ~8 MB (1M longs) — far below executor
#: pressure, far above any quantized weight (the gate's weights run
#: ~9/doc). Exceeding it raises in-plan rather than OOMing a worker.
PPSWOR_MAX_WEIGHT = 1_000_000


def ppswor_bottom_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "ws",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, probability proportional
    to an integer weight, as an exact-integer bottom-k sketch.

    Each row gets ``weight`` independent 60-bit md5 tickets (one per
    integer unit of weight); a row's priority is its MINIMUM ticket,
    and the sample is the k smallest priorities. Pairwise this gives
    the classic successive-sampling odds — P(a beats b) = w_a/(w_a+w_b)
    — i.e. PPSWOR (the bottom-k sketch with weights as multiplicities;
    the integer-exact twin of Efraimidis-Spirakis u^(1/w) keys, chosen
    here because u^(1/w) needs transcendental floats whose last-ulp
    rounding differs across engines, while min-of-integer-hashes is
    bit-identical everywhere).

    Cost: one explode proportional to TOTAL WEIGHT (callers quantize
    weights so this is ~rows x small constant), a map-side-combining
    min per key, and a global top-k (Spark's TakeOrderedAndProject —
    per-partition heaps, never a full sort). On a real cluster the
    explode is the same linear pass any tokenizer makes; a deployment
    with huge weights swaps in E-S float keys and accepts RNG-parity
    loss — this operator is the oracle-checkable gate variant.

    Output: (key, weight, ticket, rank) — rank 1..k by (ticket, key).
    NULL/zero/negative weights contribute no tickets (excluded, the
    only sensible reading of "probability proportional to w<=0").
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from proglog_spark.operators.text import keyed_string

    w = F.col(weight_col).cast("long")
    # duplicate keys: probability mass ADDS (rows of the same key are
    # one population unit with summed weight). Without this pre-agg a
    # duplicated key would keep per-row entries — sharing one ticket
    # stream, so the same key could appear TWICE in a "without
    # replacement" sample. Negative/NULL weights are excluded BEFORE
    # the sum (they carry no mass, they don't cancel other rows').
    keyed = (
        df.where(w > 0)
        .select(F.col(key_col).alias("key"), w.alias("_w"))
        .groupBy("key")
        .agg(F.sum("_w").alias("weight"))
    )
    # ADVICE-r8 guard: F.sequence materializes the FULL ticket array
    # in one row before the explode, so a single un-quantized weight
    # (say 1e8 from a caller passing raw byte counts) builds a giant
    # in-memory array and OOMs an executor — a sharper failure than
    # the documented linear-in-total-weight cost. Fail loudly at a
    # per-key cap instead (same contract-check move as zorder_key):
    # quantize weights (w // unit) before sampling, or swap in E-S
    # float keys for genuinely huge dynamic ranges.
    capped = F.when(
        F.col("weight") > PPSWOR_MAX_WEIGHT,
        F.raise_error(
            F.concat(
                F.lit(
                    "ppswor_bottom_k: per-key weight exceeds "
                    f"{PPSWOR_MAX_WEIGHT} tickets (got "
                ),
                F.col("weight").cast("string"),
                F.lit(") — quantize the weight column first"),
            )
        ),
    ).otherwise(F.col("weight"))
    tickets = keyed.select(
        "key",
        capped.alias("weight"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), capped - 1)
        ).alias("_i"),
        keyed_string(F.col("key")).alias("_ks"),
    )
    from proglog_spark.operators.placement import hash60

    pri = (
        tickets.select(
            "key",
            "weight",
            hash60(
                F.concat(
                    F.lit(f"{salt}:"), F.col("_ks"), F.lit(":"),
                    F.col("_i").cast("string"),
                )
            ).alias("_t"),
        )
        .groupBy("key", "weight")
        .agg(F.min("_t").alias("ticket"))
        .orderBy("ticket", "key")
        .limit(k)
    )
    return pri.select(
        "key",
        "weight",
        "ticket",
        F.row_number()
        .over(Window.orderBy("ticket", "key"))
        .cast("long")
        .alias("rank"),
    )
