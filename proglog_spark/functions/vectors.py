"""Vector column functions — JVM-side, no Python UDFs.

All operations stay inside whole-stage codegen via higher-order
functions (``zip_with`` + ``aggregate``): the hot path for similarity
search over ``array<float>`` embedding columns never crosses the
Python boundary. (A Pandas-UDF variant exists in
``operators/similarity.py`` for batch-heavy rerank paths; benchmarks
showed the built-in HOFs competitive at our dimensionality, so they
are the default.)

Determinism note: sums run left-to-right in array order in both Spark
and DuckDB, but float reassociation still makes cross-engine hash
comparison unsound (FIXTURES.md §3.2) — hence ``quantized_dot``,
which floors each element to an integer grid first so the arithmetic
is exact and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """NULL (not an ANSI divide-by-zero error) when either norm is 0 —
    a zero vector has no direction, so it matches nothing."""
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))


def quantized_dot(a: Column, b: Column, scale: int = 1000) -> Column:
    """Integer dot product on a floor(x*scale) grid — exact arithmetic,
    deterministic across engines, used by the oracle-checked ANN query."""
    q = F.lit(float(scale))
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.floor(x.cast("double") * q).cast("long")
            * F.floor(y.cast("double") * q).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
