"""Property-based tests (hypothesis) — randomized invariants the
scenario tests can't sweep.

Mirrors the reference's load-bearing invariants: offset density under
arbitrary append batches (internal/log/segment_test.go:28-32) and
round-trip fidelity (log_test.go:36-45), plus exactness of the
near-dup operators against pure-Python references on random corpora.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from proglog_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)


def py_jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        toks = t.split(" ")
        return {"_".join(toks[i : i + n]) for i in range(max(len(toks) - n, 0) + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_jaccard_pairs_exact_vs_python(spark, texts):
    """jaccard_pairs with no threshold must equal the all-pairs
    pure-Python computation (complete inverted-index blocking)."""
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard_micro
        for r in jaccard_pairs(df, threshold_micro=1).collect()
    }
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            jac = py_jaccard(texts[i], texts[j])
            if jac > 0:
                want[(i, j)] = math.floor(jac * 1_000_000)
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy)
def test_minhash_estimates_bounded(spark, texts):
    """MinHash band candidates: estimated jaccard is in [0, 1e6] and
    identical docs always estimate 1e6 (every band collides)."""
    texts = list(texts) + [texts[0]]  # guarantee one identical pair
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = minhash_lsh_pairs(df, threshold_micro=1).collect()
    assert all(0 <= r.est_jaccard_micro <= 1_000_000 for r in rows)
    dup_pair = (0, len(texts) - 1)
    est = {(r.id_a, r.id_b): r.est_jaccard_micro for r in rows}
    assert est.get(dup_pair) == 1_000_000


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=1, max_value=5), min_size=1, max_size=4))
def test_log_offsets_dense_under_random_batches(spark, tmp_path_factory, batch_sizes):
    """Offsets stay dense from initial_offset across arbitrary append
    batch sizes (the reference's core invariant, segment_test.go:28-32),
    and every record round-trips."""
    from proglog_spark import LogTable

    path = str(tmp_path_factory.mktemp("prop_log"))
    log = LogTable.create(spark, path, bucket_size=4, initial_offset=16)
    expect = []
    nxt = 16
    for bi, size in enumerate(batch_sizes):
        vals = [f"b{bi}-{k}" for k in range(size)]
        first, last = log.append(vals)
        assert (first, last) == (nxt, nxt + size - 1)
        expect += list(zip(range(first, last + 1), vals))
        nxt = last + 1
    got = [(r.offset, r.value) for r in log.reader().collect()]
    assert sorted(got) == sorted(expect)
    assert log.count() == sum(batch_sizes)


@pytest.fixture(scope="module")
def tmp_path_factory(tmp_path_factory):
    return tmp_path_factory
