"""Mergeable frequency sketches — approximate heavy hitters at scale.

Exact heavy-hitter detection (`events_heavy_users`,
`docs_top_terms`) shuffles one row per distinct key. At 100 TB with a
high-cardinality key (URLs, n-grams, session ids) that shuffle is the
bottleneck; the sketch path bounds state at O(k) per partition and
O(k · partitions) total, shuffling candidate summaries instead of the
key space.

Misra-Gries is chosen over Count-Min here because it is
deterministic (no hash randomness ⇒ reproducible pipelines), purely
additive under merge, and one-sided: estimates NEVER exceed the true
count and undercount by at most N/(k+1) — which makes its guarantee
assertable inside a hash-checked query (`docs_heavy_terms_sketch`).

Merge strategy follows the mergeable-summaries construction
(Agarwal, Cormode, Huang, Phillips, Wei, Yi — PODS'12): combining two
MG(k) summaries = add counts, keep the top k, subtract the (k+1)-th
largest count from the survivors. Any merge tree keeps total
undercount ≤ N/(k+1). Per partition we fold Arrow batches with that
merge (vectorized value_counts, no per-row Python); across partitions
the final combine is a plain ``groupBy(key).sum`` — summing pure
undercounts only ever yields another undercount, so the bound
survives.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proglog_spark.operators.text import token_hash32

# Mersenne prime for the pairwise-independent CMS hash family
# ((a·h + b) mod p) mod width. h is reduced mod p FIRST so a·h stays
# under 2^62 (a, h < 2^31) — int64-exact in Spark, DuckDB and numpy.
CMS_PRIME = 2_147_483_647


def cms_params(depth: int, salt: str = "cms") -> list[tuple[int, int]]:
    """The (a_j, b_j) hash constants for a depth-``depth`` sketch.

    Derived from md5 of the salt and row index — deterministic, so the
    SAME literals are inlined into the Spark expressions and the ANSI
    SQL oracle (the sketch is reproducible across engines and runs,
    like every hash in this repo; no RNG).
    """

    def h32(tag: str) -> int:
        return int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)

    return [
        (h32(f"{salt}-a-{j}") % (CMS_PRIME - 1) + 1, h32(f"{salt}-b-{j}") % CMS_PRIME)
        for j in range(depth)
    ]


def _cms_bucket_cols(key_col, depth: int, width: int, salt: str) -> list:
    h = token_hash32(key_col.cast("string")) % CMS_PRIME
    return [
        ((F.lit(a) * h + F.lit(b)) % CMS_PRIME % width).cast("long")
        for a, b in cms_params(depth, salt)
    ]


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch of ``key_col`` frequencies: ``(j, b, cnt)``
    rows, one per non-empty cell — at most ``depth × width`` total,
    regardless of input size or key cardinality.

    The complement of Misra-Gries above: MG answers "which keys are
    heavy" (no false positives on presence), CMS answers point
    frequency queries for ANY key with ``true ≤ est ≤ true + εN``
    (ε = e/width per the Cormode-Muthukrishnan bound; the LOWER bound
    is deterministic — a cell sums every colliding key's true count).

    100 TB shape: the exploded (j, bucket) stream partial-aggregates
    map-side into ≤ depth·width cells per task, so the shuffle carries
    ≤ depth·width·partitions rows — never the key space. Cell-wise sum
    of two sketches built with the same (depth, width, salt) IS the
    sketch of the union (`events_cms_merge` asserts this in the hash
    gate), so per-partition / per-day sketches roll up associatively.
    """
    buckets = _cms_bucket_cols(F.col(key_col), depth, width, salt)
    return (
        df.select(F.posexplode(F.array(*buckets)).alias("j", "b"))
        # posexplode positions are INT; the cell coordinates are BIGINT
        # everywhere else in this family (oracle included)
        .select(F.col("j").cast("long").alias("j"), "b")
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates for every row of ``keys``:
    ``(key_col, est)`` with ``est = min_j cms[j][h_j(key)]``.

    The sketch side is ≤ depth·width rows by construction, so the join
    is always broadcast — estimation never shuffles the key stream.
    """
    buckets = _cms_bucket_cols(F.col(key_col), depth, width, salt)
    kb = keys.select(key_col, F.posexplode(F.array(*buckets)).alias("j", "b")).select(
        key_col, F.col("j").cast("long").alias("j"), "b"
    )
    return (
        kb.join(F.broadcast(cms), ["j", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def misra_gries(df: DataFrame, key: str, k: int = 255) -> DataFrame:
    """Approximate per-key counts: ``(key, est)`` with
    ``true - N/(k+1) <= est <= true`` and at most ``k · partitions``
    output rows before the final sum.

    Every key whose true count exceeds N/(k+1) is guaranteed present.
    """
    out_schema = f"{key} string, est long"

    def summarize(batches):
        counts: pd.Series | None = None
        for pdf in batches:
            vc = pdf[key].value_counts()
            counts = vc if counts is None else counts.add(vc, fill_value=0)
            if len(counts) > k:
                # mergeable-summaries step: keep top k, subtract the
                # (k+1)-th count so survivors stay pure undercounts
                counts = counts.sort_values(ascending=False)
                cut = counts.iloc[k]
                counts = counts.iloc[:k] - cut
                counts = counts[counts > 0]
        if counts is None or counts.empty:
            return
        yield pd.DataFrame(
            {key: counts.index.astype(str), "est": counts.values.astype("int64")}
        )

    summaries = df.select(key).mapInPandas(summarize, out_schema)
    return summaries.groupBy(key).agg(F.sum("est").alias("est"))


def cms_inner_product(cms_a: DataFrame, cms_b: DataFrame) -> DataFrame:
    """AMS-style join-size estimate from two CMS sketches built with
    the same (depth, width, salt): ``est = min_j Σ_b a[j][b]·b[j][b]``
    — a deterministic OVERestimate of the true equi-join cardinality
    Σ_k f_a(k)·f_b(k) (hash collisions only add non-negative cross
    terms; Cormode-Muthukrishnan §4.2).

    The planner's question — "how big is this join?" — answered from
    2·depth·width integers without scanning either relation: at 100 TB
    the sketches roll up per partition/day and the estimate is a
    driver-side join of two tiny cell tables.
    """
    a = cms_a.select("j", "b", F.col("cnt").alias("cnt_a"))
    bt = cms_b.select("j", "b", F.col("cnt").alias("cnt_b"))
    return (
        a.join(bt, ["j", "b"])
        .groupBy("j")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip"))
        .agg(F.min("ip").alias("est"))
    )
