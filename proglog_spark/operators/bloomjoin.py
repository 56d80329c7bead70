"""Bloom-filter join pruning — shrink the probe side BEFORE it shuffles.

The scale problem this solves: a selective build side (say 2% of
orders) joined against a huge fact table normally shuffles the ENTIRE
fact table, then throws 98% of it away at the join. Spark's own
runtime row-group/bloom filters cover some shapes automatically; this
operator is the explicit, planner-independent version — the same
pattern as Spark's `InjectRuntimeFilter` rule, but available on any
join the caller composes (salted joins, multi-key unions, pre-1970
date keys, ...).

Mechanics, all JVM-side:

1. **Build** (one partial-agg shuffle of ≤ ``num_bits/64`` rows): each
   build key sets k bits of an m-bit filter via ``xxhash64(seed_i,
   key) mod m``; bits are OR-combined per 64-bit word with
   ``bit_or`` (map-side partial aggregation ⇒ the shuffle carries at
   most one bitmap per partition, not one row per key).
2. **Ship**: the finished bitmap (m/64 longs, ≤ 2 MB) is folded into
   the probe's plan as a literal array — exactly how Catalyst ships
   its own runtime-filter bitmaps (broadcast-sized, never data-sized).
3. **Probe** (zero extra shuffle): a whole-stage-codegen filter tests
   the k bits per probe row *upstream of the join's Exchange*, so the
   shuffle moves ~selectivity · |probe| rows instead of |probe|.

False positives pass the probe and are eliminated by the exact join
that follows — the composed result is row-identical to the plain
join (property-tested in tests/test_operators.py); only the shuffle
volume changes. False negatives are impossible.

The reference has no joins at all (SURVEY §2.0b); this is extension
surface motivated by its event-log workload joined against fixtures.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bitmap cap: 2^24 bits = 2 MiB of longs in the plan. Past that you
# want a real broadcast variable / Spark's built-in runtime filter.
MAX_BITS = 1 << 24


def _sizing(expected_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n·ln p / ln²2 bits, k = m/n·ln 2."""
    n = max(1, expected_items)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = min(MAX_BITS, max(64, ((m + 63) // 64) * 64))  # whole words
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 8)


def _hash(key: Column, seed: int, num_bits: int) -> Column:
    """Hash i: xxhash64 with a distinct leading seed literal, mod m."""
    return F.pmod(F.xxhash64(F.lit(seed), key), F.lit(num_bits))


def bloom_build(
    df: DataFrame, key: str, expected_items: int, fpp: float = 0.01
) -> tuple[list[int], int, int]:
    """Aggregate the build side's keys into a Bloom bitmap.

    Returns ``(words, num_bits, num_hashes)`` where ``words`` is the
    dense little-endian list of m/64 signed longs. The only data
    crossing the wire is the partially-aggregated bitmap itself: the
    groupBy key is the word index (≤ m/64 distinct values), and
    ``bit_or`` combines map-side, so each shuffle partition emits at
    most one row per word it touched.
    """
    num_bits, num_hashes = _sizing(expected_items, fpp)
    k = F.col(key)
    hashes = F.array(*[_hash(k, i, num_bits) for i in range(num_hashes)])
    words = (
        df.select(F.explode(hashes).alias("h"))
        .select(
            F.shiftright("h", 6).cast("int").alias("w"),
            F.pmod("h", F.lit(64)).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), b)")).alias("word"))
        .collect()
    )
    bitmap = [0] * (num_bits // 64)
    for row in words:
        bitmap[row["w"]] = row["word"]
    return bitmap, num_bits, num_hashes


def bloom_probe(
    df: DataFrame,
    key: str,
    bitmap: list[int],
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Keep only rows whose key MIGHT be in the filter (no false
    negatives). Pure codegen: k hash + shift + element_at tests, no
    extra shuffle, no Python.

    The bitmap rides as a ONE-ROW broadcast relation (cross join),
    not as a plan literal: a k-condition filter over an inlined
    array(m/64 literals) makes the analyzer walk k·m/64 expression
    nodes per query — seconds of driver time at m=2^18 — while a
    broadcast keeps the plan O(k) nodes regardless of bitmap size.
    Same shipping strategy Catalyst uses for its own runtime filters."""
    reserved = {"_bloom", *(f"_bh{i}" for i in range(num_hashes))}
    clash = reserved & set(df.columns)
    if clash:
        # '_bloom' would be AMBIGUOUS after the cross join; '_bh*'
        # would be silently replaced then dropped — fail fast
        raise ValueError(f"columns {sorted(clash)} already exist on the input")
    spark = df.sparkSession
    bloom_rel = spark.createDataFrame([(bitmap,)], "_bloom array<bigint>")
    out = df.crossJoin(F.broadcast(bloom_rel))
    conds = []
    for i in range(num_hashes):
        out = out.withColumn(f"_bh{i}", _hash(F.col(key), i, num_bits))
        conds.append(
            f"(element_at(_bloom, CAST(shiftright(_bh{i}, 6) AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST(_bh{i} % 64 AS INT))) != 0"
        )
    out = out.filter(F.expr(" AND ".join(conds)))
    return out.drop("_bloom", *[f"_bh{i}" for i in range(num_hashes)])


def bloom_filtered_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """``large.join(small, on, how)`` with the large side Bloom-pruned
    before its shuffle. Row-identical to the plain join for join types
    that never emit unmatched LARGE-side rows un-joined (inner/semi;
    for left-outer the pruned rows would lose their NULL extension, so
    it is rejected).

    ``expected_items`` defaults to a count of the build side — one
    cheap stats-or-scan job; pass it explicitly when you already know.
    """
    if how not in {"inner", "semi", "left_semi", "leftsemi"}:
        raise ValueError(
            f"bloom_filtered_join supports inner/semi joins only, got {how!r}: "
            "outer flavors would drop the NULL-extended rows the probe pruned"
        )
    n = expected_items if expected_items is not None else small.select(on).count()
    bitmap, num_bits, num_hashes = bloom_build(small, on, n, fpp)
    pruned = bloom_probe(large, on, bitmap, num_bits, num_hashes)
    return pruned.join(small, on=on, how=how)
