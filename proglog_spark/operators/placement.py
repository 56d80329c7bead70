"""Data-placement operators: rendezvous (HRW) shard assignment and
Z-order (Morton) layout keys.

At 100 TB the engine is not just queries — it is also the WRITER that
lays data out so later scans prune. Two placement primitives cover the
two axes:

- :func:`rendezvous_shard` — highest-random-weight hashing assigns
  each key an owning shard such that adding/removing a shard moves
  only ~1/n of the keys (the property modulo-hashing lacks: changing
  ``n`` in ``hash % n`` remaps almost every key). This is how a
  distributed ingest tier picks a stable home for a key without a
  central directory — the reference's single-node log has no sharding
  at all (SURVEY §1.3); this is the scale-out placement analog of its
  segment routing (internal/log/log.go segment selection by offset).

- :func:`zorder_key` — interleaves the bits of two bounded dimensions
  into one Morton code, so sorting/filing by the code co-locates rows
  that are close in BOTH dimensions. Files cut from z-ranges have
  tight min/max on every interleaved column, which is exactly what
  parquet zone maps / Spark's data-skipping consume: a predicate on
  EITHER dimension prunes ~sqrt-fraction of files instead of all-but-
  linear on the sort-leading column only.

Both are pure column expressions — whole-stage codegen, zero Python,
zero shuffle; placement cost is absorbed into the write projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(s: Column) -> Column:
    """Deterministic 60-bit integer from a string column: first 15 hex
    digits of md5 — the repo's cross-engine digest convention
    (DuckDB replay: ``CAST(('0x' || substr(md5(x), 1, 15)) AS
    BIGINT)``). 60 bits keeps the value comfortably inside a signed
    64-bit integer in both engines; collisions at any realistic key
    count are ~n²/2⁶¹ (≈5e-11 even at a billion keys per shard pool).
    """
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def rendezvous_scores(key_col: Column, n_shards: int, salt: str = "hrw") -> Column:
    """Array of (score, shard) structs, one per shard — the HRW score
    table for one key. Kept separate from the argmax so callers can
    also rank (e.g. primary + replica = top-2 shards)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from proglog_spark.operators.text import keyed_string

    key_s = keyed_string(key_col)
    return F.array(
        *[
            F.struct(
                hash60(
                    F.concat(F.lit(f"{salt}:{s}:"), key_s)
                ).alias("score"),
                F.lit(s).cast("long").alias("shard"),
            )
            for s in range(n_shards)
        ]
    )


def rendezvous_shard(key_col: Column, n_shards: int, salt: str = "hrw") -> Column:
    """Owning shard for a key under highest-random-weight hashing:
    ``argmax_s hash(salt, s, key)``.

    Struct comparison orders by the first field, so ``array_max`` over
    (score, shard) structs IS the argmax — one codegen'd projection,
    no explode, no window, no shuffle. Scores are 60-bit md5-derived
    integers, so ties are (2⁻⁶⁰-probability) non-events and the
    tiebreak — larger shard id — is still deterministic."""
    return F.array_max(rendezvous_scores(key_col, n_shards, salt)).getField(
        "shard"
    )


def zorder_key(dim_a: Column, dim_b: Column, bits: int = 8) -> Column:
    """Morton interleave of two already-bucketed integer dimensions
    (each in ``[0, 2**bits)``) into one ``2*bits``-wide layout key:
    bit ``b`` of ``dim_a`` lands at position ``2b``, of ``dim_b`` at
    ``2b+1``.

    Callers bucket dimensions FIRST (range-clamp, quantize) — this
    function guards the contract loudly instead of silently masking:
    an out-of-range bucket would alias into another z-region and
    corrupt the layout's pruning guarantee.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    hi = F.lit((1 << bits) - 1).cast("long")
    a = dim_a.cast("long")
    b = dim_b.cast("long")
    z = F.lit(0).cast("long")
    for k in range(bits):
        z = z + F.shiftleft(F.shiftright(a, k).bitwiseAND(F.lit(1)), 2 * k)
        z = z + F.shiftleft(F.shiftright(b, k).bitwiseAND(F.lit(1)), 2 * k + 1)
    ok = (
        (a >= 0) & (a <= hi) & (b >= 0) & (b <= hi)
        & a.isNotNull() & b.isNotNull()
    )
    return F.when(ok, z).otherwise(
        F.raise_error(
            F.lit(
                f"zorder_key: bucketed dims must be non-null in [0, {1 << bits})"
            )
        )
    )
