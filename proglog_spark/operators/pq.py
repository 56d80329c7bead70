"""Product quantization (PQ) for approximate nearest-neighbor search.

PQ splits each vector into ``m`` subspaces and replaces every
subvector with the index of its nearest codeword, so a corpus vector
is stored as ``m`` small integers instead of ``dim`` floats — the
memory-bandwidth compression FAISS pairs with IVF for billion-scale
search (Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", TPAMI 2011). Query scoring is ADC (asymmetric
distance computation): the query stays exact, one tiny
``query × subspace × codeword`` dot-product lookup table is built
driver-side, and each corpus vector's score is ``m`` table lookups
summed — the scan reads codes, never embeddings.

Everything here is integer-exact on the ``floor(x·scale)`` grid, the
repo's established oracle discipline (operators/similarity.py): L2
codebook training is truncating-integer Lloyd (sign(s)·(|s| div cnt)
member means — DuckDB ``//`` truncates toward zero while numpy floors,
so both engines run the shared sign-decomposed form), assignment keys
are ``2·(x·c) − |c|²`` (the |x|² term is constant per row, dropped),
ties go to the LOWEST codeword index (numpy first-max ==
``list_position(ks, list_max(ks))``), and ADC scores are exact int64
dot products — so training, encoding, and the approximate top-k all
hash-match an ANSI SQL oracle (queries.py::_pq_ann_oracle).

100 TB shape: training collects only the bounded deterministic sample
(``similarity.ivf_train_sample``, ≤ 2^18 rows at any corpus size);
encoding is one Arrow pass against the closure-shipped codebooks
(m·n_codes·sub int64s); scoring reads the ``m``-int code column only
and shuffles (query, id, score) triples into the two-phase per-query
top-k. Behavioral anchor: the reference engine stores opaque record
bytes (/root/reference/internal/log/store.go) — vector compression is
a north-star extension, not reference parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from proglog_spark.operators.similarity import ivf_train_sample
from proglog_spark.operators.topk import topk_per_key

# ADC keeps the query set driver-side (the LUT is per-query); keep the
# contract honest with an explicit bound rather than an implicit OOM.
MAX_ADC_QUERIES = 4096


def _quantize_rows(rows, scale: int) -> np.ndarray:
    """collected vector rows -> int64 floor(x*scale) grid matrix — the
    repo's one quantization contract, defined once."""
    return np.floor(
        np.stack([np.asarray(r[1], dtype=np.float64) for r in rows]) * scale
    ).astype(np.int64)


def _sub_keys(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Assignment keys for one subspace: key[v, c] = 2·(x[v]·c) − |c|².

    Maximizing this minimizes L2 distance to the codeword (|x|² is
    constant per row). int64-exact: |components| ≤ scale ⇒
    |2d| + |c|² ≤ 3·sub·scale² (≈ 10⁸ at sub=32, scale=1000).
    """
    return 2 * (x @ cents.T) - (cents.astype(np.int64) ** 2).sum(axis=1)[None, :]


def quantized_pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 16,
    n_codes: int = 256,
    iters: int = 3,
    sample_mod: int | None = None,
    max_train_rows: int = 1 << 18,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    sample_rows: list | None = None,
) -> np.ndarray:
    """Train the ``(m, n_codes, dim/m)`` int64 codebook tensor.

    Per subspace: integer Lloyd on the quantized sample — init from
    the first ``n_codes`` sample subvectors by id, assignment by
    :func:`_sub_keys` argmax (ties to the lowest index), update by the
    truncating integer mean sign(s)·(|s| div cnt); an empty cell
    carries its previous codeword. Deterministic end to end, replayed
    literally by the SQL oracle.
    """
    assert dim % m == 0, "dim must split evenly into m subspaces"
    sub = dim // m
    assert 3 * sub * scale * scale < 2**62, "assignment keys must fit int64"
    rows = sample_rows if sample_rows is not None else ivf_train_sample(
        corpus, sample_mod, max_train_rows, id_col=id_col, vec_col=vec_col
    )
    return pq_train_matrix(_quantize_rows(rows, scale), m, n_codes, iters)


def pq_train_matrix(qm: np.ndarray, m: int, n_codes: int, iters: int) -> np.ndarray:
    """The pure integer Lloyd core over an already-quantized int64
    matrix — shared by raw-vector training (:func:`quantized_pq_train`)
    and residual training (:func:`quantized_ivfpq_ann_topk` with
    ``by_residual=True``, where the rows are x − centroid on the same
    grid)."""
    assert qm.shape[1] % m == 0, "dim must split evenly into m subspaces"
    sub = qm.shape[1] // m
    # key bound with the widest inputs this core accepts (residuals:
    # |component| <= 2*scale): 3*sub*max|x|^2 must fit int64
    assert 3 * sub * int(np.abs(qm).max() if qm.size else 0) ** 2 < 2**62, (
        "assignment keys would overflow int64 — lower scale or dim"
    )
    books = []
    for j in range(m):
        x = qm[:, j * sub : (j + 1) * sub]
        cents = x[:n_codes].copy()
        for _ in range(iters):
            assign = _sub_keys(x, cents).argmax(axis=1)
            nxt = cents.copy()
            for c in range(n_codes):
                members = x[assign == c]
                if not len(members):
                    continue  # empty cell: carry the previous codeword
                s = members.sum(axis=0)  # exact: |s| <= len * scale
                nxt[c] = np.where(s < 0, -1, 1) * (np.abs(s) // len(members))
            cents = nxt
        books.append(cents)
    return np.stack(books)


def with_pq_codes(
    df: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    scale: int = 1000,
    out_col: str = "pq_codes",
) -> DataFrame:
    """Append the ``m``-int PQ code array: per subspace, the argmax of
    :func:`_sub_keys` against the closure-shipped codebooks. One
    Arrow-batched int64 matmul per subspace per batch.
    """
    B = np.asarray(codebooks, dtype=np.int64)
    m, _, sub = B.shape
    sc = scale

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _codes(vecs: pd.Series) -> pd.Series:
        from proglog_spark.operators.linalg import (
            masked_vector_rows,
            scatter_masked,
        )

        # NULL vector -> NULL code array (linalg NULL-skip contract)
        mask, mat = masked_vector_rows(vecs)
        rows = []
        if mat.size:
            qm = np.floor(mat * sc).astype(np.int64)
            out = np.empty((len(qm), m), dtype=np.int64)
            for j in range(m):
                x = qm[:, j * sub : (j + 1) * sub]
                out[:, j] = _sub_keys(x, B[j]).argmax(axis=1)
            rows = [[int(c) for c in row] for row in out]
        return pd.Series(list(scatter_masked(mask, rows)))

    return df.select("*", _codes(F.col(vec_col)).alias(out_col))


def quantized_pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 16,
    n_codes: int = 256,
    iters: int = 3,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    sample_rows: list | None = None,
) -> DataFrame:
    """ADC top-k over PQ codes: ``(query_id, vec_id, adc_dot, rank)``.

    adc_dot = Σ_j q_j · codeword_j(code_j(x)) — the quantized-corpus
    approximation of the exact dot product, int64-exact, so the
    approximate answer itself (codes, LUT, ranking) hash-matches the
    SQL oracle. Corpus vectors are read once to encode; scoring scans
    the code column only.
    """
    books = quantized_pq_train(
        corpus, dim, m, n_codes, iters, sample_mod,
        id_col=id_col, vec_col=vec_col, scale=scale,
        sample_rows=sample_rows,
    )
    qids, _, lut = _query_lut(queries, books, id_col, vec_col, scale)

    coded = with_pq_codes(corpus.select(id_col, vec_col), books, vec_col, scale)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _adc(codes: pd.Series) -> pd.Series:
        from proglog_spark.operators.linalg import (
            masked_vector_rows,
            scatter_masked,
        )

        # NULL code array (a NULL embedding upstream) scores NULL —
        # posexplode then drops the row
        mask, Cf = masked_vector_rows(codes)
        rows = []
        if Cf.size:
            C = Cf.astype(np.int64)  # (rows, m)
            s = np.zeros((len(C), lut.shape[0]), dtype=np.int64)
            for j in range(m):
                s += lut[:, j, :][:, C[:, j]].T
            rows = [list(row) for row in s]
        return pd.Series(list(scatter_masked(mask, rows)))

    scored = (
        coded.select(id_col, F.posexplode(_adc(F.col("pq_codes"))).alias("qpos", "adc_dot"))
        .select(
            F.element_at(F.lit(qids), F.col("qpos") + 1).alias("query_id"),
            id_col,
            "adc_dot",
        )
        .where(F.col(id_col) != F.col("query_id"))
    )
    return topk_per_key(
        scored,
        ["query_id"],
        [F.col("adc_dot").desc(), F.col(id_col)],
        k,
        rank_col="rank",
    ).select("query_id", id_col, "adc_dot", "rank")


def _query_lut(queries: DataFrame, books: np.ndarray, id_col, vec_col, scale):
    """Collect the (bounded) query set and build the ADC lookup
    tensor: ids, lut[qi, j, code] = q_j · codeword."""
    m, _, sub = books.shape
    # NULL query vectors are skipped (no LUT row -> the query simply
    # emits no results) — np.stack over a None is an opaque worker/
    # driver TypeError otherwise, the linalg NULL-skip contract
    q_rows = (
        queries.select(id_col, vec_col)
        .where(F.col(vec_col).isNotNull())
        .orderBy(id_col)
        .limit(MAX_ADC_QUERIES + 1)
        .collect()
    )
    assert len(q_rows) <= MAX_ADC_QUERIES, (
        f"ADC keeps the query set driver-side; got > {MAX_ADC_QUERIES} queries"
    )
    qids = [int(r[0]) for r in q_rows]
    qm = _quantize_rows(q_rows, scale)
    lut = np.stack(
        [qm[:, j * sub : (j + 1) * sub] @ books[j].T for j in range(m)], axis=1
    )
    return qids, qm, lut


def quantized_ivfpq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 16,
    ivf_iters: int = 3,
    n_probe: int = 4,
    m: int = 16,
    n_codes: int = 256,
    pq_iters: int = 3,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    by_residual: bool = False,
    sample_rows: list | None = None,
) -> DataFrame:
    """IVF-PQ ANN (the FAISS IndexIVFPQ shape, raw-vector codebooks):
    IVF cells route each query to ``n_probe/n_cells`` of the corpus,
    PQ-ADC scores only those candidates from their 16-byte codes —
    ``(query_id, vec_id, adc_dot, rank)``, hash-matching the SQL
    oracle end to end (both trainings included).

    This is the billion-scale composition: the scan that matters reads
    (id, cell, codes) — never the embedding column — and the probed
    cells bound the per-query work. One Arrow pass computes cell AND
    codes together; candidate selection is a broadcast join on the
    probed cells; ranking is the two-phase per-query top-k.

    ``by_residual=True`` (the FAISS IndexIVFPQ default) trains the PQ
    codebooks on, and encodes, the residual x − centroid(cell(x)) —
    the code budget spends on within-cell variation, so recall at the
    same 16-byte code is strictly better. ADC adds the per-(query,
    cell) centroid dot back: score = q·c_cell + Σ_j q_j·codeword_j.
    Residual components stay on the integer grid (|r| ≤ 2·scale), so
    the residual path is oracle-exact too.
    """
    from proglog_spark.operators.similarity import (
        _quantized_cell_keys,
        quantized_ivf_train,
        with_quantized_ivf_cells,
    )

    # one bounded sample collect feeds BOTH trainers (they would each
    # re-run the corpus count + ordered-limit collect otherwise); a
    # caller sharing the sample across indexes passes it pre-collected
    sample = sample_rows if sample_rows is not None else ivf_train_sample(
        corpus, sample_mod, id_col=id_col, vec_col=vec_col
    )
    cents = quantized_ivf_train(
        corpus, n_cells, ivf_iters, sample_mod,
        id_col=id_col, vec_col=vec_col, scale=scale, sample_rows=sample,
    )
    if by_residual:
        # same input contract as the raw path (quantized_pq_train
        # asserts this); pq_train_matrix re-checks the residual-widened
        # int64 bound itself
        assert dim % m == 0, "dim must split evenly into m subspaces"
        qm_s = _quantize_rows(sample, scale)
        assign = _quantized_cell_keys(qm_s, cents, scale).argmax(axis=1)
        books = pq_train_matrix(qm_s - cents[assign], m, n_codes, pq_iters)
    else:
        books = quantized_pq_train(
            corpus, dim, m, n_codes, pq_iters, sample_mod,
            id_col=id_col, vec_col=vec_col, scale=scale, sample_rows=sample,
        )
    qids, qm_q, lut = _query_lut(queries, books, id_col, vec_col, scale)
    pos = {qid: i for i, qid in enumerate(qids)}

    # one corpus scan: IVF cell (n_probe=1) + PQ codes, embeddings
    # dropped before anything shuffles
    if by_residual:
        idx = _with_cell_and_residual_codes(
            corpus.select(id_col, vec_col), cents, books, vec_col, scale
        ).select(id_col, "ivf_cell", "pq_codes")
        # the coarse ADC term: per-(query, cell) centroid dots, from
        # the SAME bounded collect _query_lut already did
        cellterm = qm_q @ cents.T  # (n_queries, n_cells) int64
    else:
        idx = with_quantized_ivf_cells(
            corpus.select(id_col, vec_col), cents, 1, vec_col, scale
        )
        idx = with_pq_codes(idx, books, vec_col, scale).select(
            id_col, "ivf_cell", "pq_codes"
        )
        cellterm = None
    probes = with_quantized_ivf_cells(
        queries.select(id_col, vec_col), cents, n_probe, vec_col, scale
    ).select(F.col(id_col).alias("query_id"), "ivf_cell")

    cand = idx.join(F.broadcast(probes), on="ivf_cell").where(
        F.col(id_col) != F.col("query_id")
    )

    @F.pandas_udf(T.LongType())
    def _adc_at(qid_s: pd.Series, cell_s: pd.Series, codes: pd.Series) -> pd.Series:
        from proglog_spark.operators.linalg import (
            masked_vector_rows,
            scatter_masked,
        )

        # NULL code array (a NULL embedding upstream) scores NULL —
        # such rows never enter the candidate ranking
        mask, Cf = masked_vector_rows(codes)
        vals = []
        if Cf.size:
            C = Cf.astype(np.int64)
            qi = qid_s[mask].map(pos).to_numpy(dtype=np.int64)
            s = np.zeros(len(C), dtype=np.int64)
            for j in range(m):
                s += lut[qi, j, C[:, j]]
            if cellterm is not None:
                s += cellterm[qi, cell_s[mask].to_numpy(dtype=np.int64)]
            vals = [int(v) for v in s]
        return pd.Series(list(scatter_masked(mask, vals)), dtype=object)

    scored = cand.select(
        "query_id",
        id_col,
        _adc_at(
            F.col("query_id"), F.col("ivf_cell"), F.col("pq_codes")
        ).alias("adc_dot"),
    )
    return topk_per_key(
        scored,
        ["query_id"],
        [F.col("adc_dot").desc(), F.col(id_col)],
        k,
        rank_col="rank",
    ).select("query_id", id_col, "adc_dot", "rank")


def _with_cell_and_residual_codes(
    df: DataFrame,
    centroids,
    codebooks,
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Append (ivf_cell, pq_codes) in ONE Arrow pass for the residual
    path: assign the cell with the IVF key, subtract the cell centroid
    on the integer grid, encode the residual against the residual
    codebooks."""
    from proglog_spark.operators.similarity import _quantized_cell_keys

    C = np.asarray(centroids, dtype=np.int64)
    B = np.asarray(codebooks, dtype=np.int64)
    m, _, sub = B.shape
    sc = scale

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("ivf_cell", T.IntegerType()),
                T.StructField("pq_codes", T.ArrayType(T.IntegerType())),
            ]
        )
    )
    def _cr(vecs: pd.Series) -> pd.DataFrame:
        from proglog_spark.operators.linalg import (
            masked_vector_rows,
            scatter_masked,
        )

        # NULL vector -> NULL (cell, codes) struct fields; the cell
        # equi-join then drops the row (linalg NULL-skip contract)
        mask, mat = masked_vector_rows(vecs)
        cells, codes = [], []
        if mat.size:
            qm = np.floor(mat * sc).astype(np.int64)
            cell = _quantized_cell_keys(qm, C, sc).argmax(axis=1)
            resid = qm - C[cell]
            out = np.empty((len(qm), m), dtype=np.int64)
            for j in range(m):
                out[:, j] = _sub_keys(resid[:, j * sub : (j + 1) * sub], B[j]).argmax(
                    axis=1
                )
            cells = [int(c) for c in cell]
            codes = [[int(c) for c in row] for row in out]
        return pd.DataFrame(
            {
                "ivf_cell": list(scatter_masked(mask, cells)),
                "pq_codes": list(scatter_masked(mask, codes)),
            }
        )

    return df.select("*", _cr(F.col(vec_col)).alias("_cr")).select(
        "*", "_cr.ivf_cell", "_cr.pq_codes"
    ).drop("_cr")
