"""Distributed linear algebra for embedding-table analytics.

The scale pattern here is *partial aggregation of small dense
matrices*: each Arrow batch contributes one d×d partial Gram matrix
(numpy, vectorized), Spark reduces partition-count partials, and only
the final d×d matrix — O(d²), independent of row count — reaches the
driver, where the iterative eigensolve runs. At 100 TB the data never
moves: one narrow mapInPandas pass + a tiny all-to-one reduce, no
wide shuffle of vectors.

The reference has no vector math at all (payloads are opaque bytes,
api/v1/log.proto:8); this is north-star embedding-pipeline surface
(PCA for whitening / dedup preconditioning / drift monitoring).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

POWER_ITERATIONS = 300


def gram_matrix(df: DataFrame, vec_col: str = "embedding", dim: int | None = None):
    """Compute (n, X^T X) for the vector column — distributed.

    Returns ``(n_rows, numpy (d,d) float64)``. One mapInPandas pass
    emits a flattened partial per Arrow batch; the driver sums the
    ~numPartitions partials (bounded, small). Equivalent to
    ``treeAggregate`` without leaving the DataFrame API.
    """
    if dim is None:
        first = df.select(vec_col).first()
        if first is None:
            raise ValueError("gram_matrix on empty DataFrame")
        dim = len(first[0])
    d = dim

    def partials(batches):
        acc = np.zeros((d, d), dtype=np.float64)
        n = 0
        for pdf in batches:
            m = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if len(m):
                acc += m.T @ m
                n += len(m)
        if n:
            yield pd.DataFrame({"n": [n], "gram": [acc.ravel().tolist()]})

    rows = df.select(vec_col).mapInPandas(
        partials, "n LONG, gram ARRAY<DOUBLE>"
    ).collect()
    if not rows:
        raise ValueError("gram_matrix on empty DataFrame")
    n_total = sum(r.n for r in rows)
    gram = np.sum(
        [np.asarray(r.gram, dtype=np.float64).reshape(d, d) for r in rows],
        axis=0,
    )
    return n_total, gram


def top_components(
    gram: np.ndarray, k: int = 2, iterations: int = POWER_ITERATIONS
) -> list[tuple[float, np.ndarray]]:
    """Top-k eigenpairs of a symmetric PSD matrix by power iteration
    with deflation. Deterministic: fixed all-ones start vector, fixed
    iteration count, sign normalized so the largest-|loading| entry is
    positive. Driver-side on a d×d matrix — O(k·iters·d²), data-free.
    """
    g = gram.copy()
    d = g.shape[0]
    out: list[tuple[float, np.ndarray]] = []
    for _ in range(k):
        v = np.ones(d) / np.sqrt(d)
        for _i in range(iterations):
            w = g @ v
            norm = np.linalg.norm(w)
            if norm == 0.0:
                break
            v = w / norm
        lam = float(v @ g @ v)
        top = int(np.argmax(np.abs(v)))
        if v[top] < 0:
            v = -v
        out.append((lam, v))
        g = g - lam * np.outer(v, v)  # deflate
    return out


def pca_summary(
    df: DataFrame, vec_col: str = "embedding", k: int = 2
) -> DataFrame:
    """Top-k PCA (uncentered) summary as a DataFrame: per component its
    eigenvalue share of total variance (micro fixed-point), the
    dimension with the largest loading, and that loading (milli).

    Output is a k-row JVM VALUES relation — numeric literals only. The
    eigensolve is iterative (power method), hence rows-only checked
    (SURVEY §2.1: float reassociation across partition partials).
    """
    spark = df.sparkSession
    _n, gram = gram_matrix(df, vec_col)
    total_var = float(np.trace(gram))
    comps = top_components(gram, k)
    values = ", ".join(
        f"({i}, {int(np.floor(1e6 * lam / total_var))}, "
        f"{int(np.argmax(np.abs(v)))}, {int(np.floor(1e3 * v[np.argmax(np.abs(v))]))})"
        for i, (lam, v) in enumerate(comps)
    )
    return spark.sql(
        f"SELECT * FROM (VALUES {values}) AS "
        "t(component, var_share_micro, top_dim, top_loading_milli) "
        "ORDER BY component"
    )
