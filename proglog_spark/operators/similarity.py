"""Similarity search over embedding columns (array<float>).

Three tiers, all shuffle-minimal:

- ``brute_force_topk`` — exact cosine top-k: broadcast the query
  vectors, per-partition partial top-k, single merge. The baseline.
- ``quantized_dot_topk`` — integer-grid dot product (exact
  arithmetic), the oracle-checkable variant of the same plan shape.
- ``lsh_ann_topk`` — random-hyperplane LSH: sign-bit signatures
  bucket the corpus; search only the query's bucket (and its
  1-bit-flip neighbors for recall). The 100 TB path: candidate set
  per query is ~corpus/2^bits, and bucketing is one narrow pass.
  An IVF variant would swap the hash for k-means cells; hyperplanes
  chosen here because they need no training pass.

Hyperplanes are deterministic: component d of plane p is ±1 by bit
(p*DIM+d) of md5 — no RNG state, stable across sessions (signs of
±1-hyperplane dots are exact, no float-tie nondeterminism in
bucketing; top-k *ranking* under float cosine is still
property-tested, not hash-checked — FIXTURES.md §3.5).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proglog_spark.functions.vectors import cosine_similarity, quantized_dot


def _with_topk_rank(scored: DataFrame, query_id_col: str, order_cols) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(*order_cols)
    return scored.withColumn("rank", F.row_number().over(w).cast("long"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank).

    queries is small ⇒ broadcast; the join is a broadcast nested loop
    over one corpus pass, and the window's partition key is query_id
    so the top-k shuffle moves only (ids, score) — never vectors.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            cosine_similarity(F.col(vec_col), F.col("q_vec")).alias("cosine"),
        )
    )
    ranked = _with_topk_rank(scored, "query_id", [F.col("cosine").desc(), F.col(id_col)])
    return ranked.where(F.col("rank") <= k)


def quantized_dot_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Integer-exact dot-product top-k — deterministic, oracle-checked.

    Same physical shape as brute_force_topk; scores are exact BIGINTs
    so ordering (score desc, vec_id) is total across engines.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            quantized_dot(F.col(vec_col), F.col("q_vec"), scale).alias("qdot"),
        )
    )
    ranked = _with_topk_rank(scored, "query_id", [F.col("qdot").desc(), F.col(id_col)])
    return ranked.where(F.col("rank") <= k).select("query_id", id_col, "qdot", "rank")


def hyperplane_signs(dim: int, bits: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 bits (no RNG state)."""
    planes = []
    for p in range(bits):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).digest()
            row.append(1 if h[0] & 1 else -1)
        planes.append(row)
    return planes


def with_lsh_bucket(
    df: DataFrame, dim: int, bits: int = 8, vec_col: str = "embedding"
) -> DataFrame:
    """Append an integer LSH bucket: bit p = sign(vec · plane_p).

    ±1 planes make the dot a signed sum of elements — computed with
    zip_with/aggregate, JVM-side, exact sign behavior.
    """
    planes = hyperplane_signs(dim, bits)
    bucket = F.lit(0).cast("long")
    for p, signs in enumerate(planes):
        sign_arr = F.array(*[F.lit(float(s)) for s in signs])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), sign_arr, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
    return df.withColumn("lsh_bucket", bucket)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 8,
    probe_flips: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via hyperplane-LSH bucketing.

    Multi-probe: each query also searches buckets within
    ``probe_flips`` bit flips (recall/cost knob). The join is an
    equi-join on bucket id — at scale this is the difference between
    touching the whole corpus and touching ~(1+bits)/2^bits of it.
    """
    c = with_lsh_bucket(corpus, dim, bits, vec_col)
    q = with_lsh_bucket(queries, dim, bits, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("lsh_bucket").alias("q_bucket"),
    )
    probes = [F.col("q_bucket")]
    if probe_flips >= 1:
        probes += [F.col("q_bucket").bitwiseXOR(F.lit(1 << p)) for p in range(bits)]
    q = q.withColumn("probe_bucket", F.explode(F.array(*probes)))
    scored = (
        c.join(
            F.broadcast(q),
            on=F.col("lsh_bucket") == F.col("probe_bucket"),
        )
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            cosine_similarity(F.col(vec_col), F.col("q_vec")).alias("cosine"),
        )
        .dropDuplicates(["query_id", id_col])
    )
    ranked = _with_topk_rank(scored, "query_id", [F.col("cosine").desc(), F.col(id_col)])
    return ranked.where(F.col("rank") <= k)


def embedding_cosine_neardup(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate embedding pairs (cosine >= threshold) via LSH
    self-join — the embedding analog of minhash_lsh_pairs. Pairs in
    the same bucket are verified exactly; property-tested recall.
    """
    c = with_lsh_bucket(df, dim, bits, vec_col)
    a = c.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "lsh_bucket"
    )
    b = c.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "lsh_bucket"
    )
    return (
        a.join(b, on="lsh_bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("vec_a"), F.col("vec_b")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
