"""Skew-mitigation utilities for hot join keys.

AQE's skew-join splitting (on in ``session.py``) handles most runtime
skew by subdividing oversized shuffle partitions. Salting is the
explicit, planner-independent tool for the pathological case — a
single join key holding an outsized share of rows (the classic
power-law event stream): it trades ``salt_factor``-fold replication
of the small side for an even distribution of the hot key across
``salt_factor`` reducers.

The reference never joins, so this is pure extension surface — but
its motivating workload (per-user/per-type event analytics over a
Zipfian key space) is exactly where a 1000-executor job dies without
one of these two tools.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys in ``large``.

    The large side gets a deterministic salt in [0, salt_factor) from
    a hash of its whole row (xxhash64 of all columns — no RNG, stable
    across retries, which matters for exactly-once sinks); the small
    side is replicated salt_factor times so every (key, salt) bucket
    finds its match. Result is row-identical to ``large.join(small,
    on, how)`` with the hot key spread over salt_factor reducers.

    Use when the small side is too big to broadcast AND a key is hot
    enough that AQE's split granularity (one shuffle block) can't
    help; otherwise prefer broadcast() or plain join + AQE.

    ``how`` is restricted to joins where replicating the small side
    cannot duplicate output: right/full outer would emit an unmatched
    small-side row once per salt bucket.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross"}
    if how not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side "
            f"rows would appear once per salt bucket (allowed: inner/left/semi/anti)"
        )
    if "_salt" in large.columns or "_salt" in small.columns:
        # withColumn would silently REPLACE a caller's '_salt' (and the
        # final drop would remove it), breaking the row-identical
        # contract — fail fast instead
        raise ValueError("column '_salt' already exists on an input")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salt_factor))
    l_salted = large.withColumn("_salt", salt.cast("int"))
    s_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    return l_salted.join(s_salted, on=[on, "_salt"], how=how).drop("_salt")
