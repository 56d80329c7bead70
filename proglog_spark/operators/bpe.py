"""Distributed BPE (byte-pair encoding) tokenizer training.

`docs_tokenize_ids` learns a word-level vocabulary; real tokenizers
are subword. BPE training is inherently iterative (each merge depends
on the previous), so the engine splits it the way the algorithm's
data sizes dictate:

1. **Corpus pass (the only big-data stage, ONE shuffle):** tokenize
   and reduce to the weighted word-frequency table — BPE statistics
   are a pure function of (distinct word, count), so 100 TB of text
   collapses to a vocabulary-sized table before any iteration runs.
2. **Merge loop (vocabulary-sized, driver-coordinated):** per
   iteration, explode adjacent symbol pairs weighted by word count,
   aggregate, take the arg-max pair (deterministic tie-break: count
   desc, then pair lexicographic), and apply the merge to the symbol
   arrays with an Arrow-batched pandas UDF. Each iteration is two
   narrow jobs over |vocab| rows; lineage is truncated with
   localCheckpoint every few merges so plan depth stays O(1).

The loop is a driver loop by design — the reference point is
`emb_pca_power` (SURVEY §8), the engine's other iterative algorithm:
iterate on a REDUCED representation, never on the corpus.

Determinism: no RNG anywhere; ties break lexicographically, so the
merge sequence is reproducible run-to-run and machine-to-machine
(property-tested against a pure-Python reference implementation in
tests/test_operators.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) — the one corpus-wide reduction BPE needs."""
    return (
        df.select(F.explode(F.split(text_col, " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_pair(s: list, a: str, b: str) -> list:
    """One left-to-right, non-overlapping (a, b) -> a+b merge pass —
    THE core BPE step, shared by training and encoding so the two
    cannot drift (train/encode agreement is the tokenizer contract)."""
    merged = a + b
    i, res = 0, []
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            res.append(merged)
            i += 2
        else:
            res.append(s[i])
            i += 1
    return res


def _apply_merge(a: str, b: str):
    @F.pandas_udf("array<string>")
    def fn(syms: pd.Series) -> pd.Series:
        return pd.Series([merge_pair(list(s), a, b) for s in syms])

    return fn


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge list (the tokenizer artifact).

    Stops early when the best pair's weighted count falls below
    ``min_pair_count`` (nothing left worth merging)."""
    vocab = word_freq_table(df, text_col).withColumn(
        "syms",
        F.concat(
            F.split(F.col("word"), ""),  # characters
            F.array(F.lit(END)),
        ),
    )
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for it in range(num_merges):
        pairs = (
            # fully-merged words (one symbol left) contribute no pairs;
            # without the filter sequence(1, 0) yields the DESCENDING
            # [1, 0] and element_at(syms, 0) aborts the job under ANSI
            vocab.where(F.size("syms") >= 2)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS a, "
                        "element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
        )
        best = pairs.orderBy(F.col("cnt").desc(), "a", "b").limit(1).collect()
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        vocab = vocab.withColumn("syms", _apply_merge(a, b)(F.col("syms")))
        if (it + 1) % 4 == 0:  # bound plan depth / UDF chain length
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list: (id, n_words, n_tokens, tokens
    prefix). One Arrow-batched pass over the corpus, merges applied
    per word in learned order (the standard greedy BPE encoder)."""
    merge_list = list(merges)
    # Zipf makes a distinct-word cache the whole ballgame: each worker
    # encodes a word ONCE and every later occurrence is a dict hit —
    # the merge loop runs |vocab| times per worker, not |corpus tokens|
    # times. The dict lives in the UDF CLOSURE (not the batch-function
    # body), so it persists across Arrow batches for the worker's
    # lifetime; safe because encoding is a pure function of the frozen
    # merge list. Bounded: past _CACHE_CAP entries new words are
    # encoded without being inserted (Zipf means the hot head is
    # already resident by then), so high-cardinality corpora (random
    # IDs, hashes) cannot grow a worker's dict without limit.
    _CACHE_CAP = 1 << 20
    cache: dict[str, list[str]] = {}

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        def enc_word(word: str) -> list[str]:
            s = list(word) + [END]
            for a, b in merge_list:
                if len(s) < 2:
                    break
                s = merge_pair(s, a, b)
            return s

        out = []
        for text in texts:
            toks: list[str] = []
            for word in text.split(" "):
                if not word:
                    continue
                t = cache.get(word)
                if t is None:
                    t = enc_word(word)
                    if len(cache) < _CACHE_CAP:
                        cache[word] = t
                toks.extend(t)
            out.append(toks)
        return pd.Series(out)

    toks = df.select(
        id_col,
        # count only the words the encoder iterates (split emits empty
        # strings for doubled/leading spaces; enc skips them) so the
        # n_tokens >= n_words invariant holds on any whitespace shape
        F.filter(F.split(text_col, " "), lambda w: w != "").alias("w"),
        enc(text_col).alias("t"),
    )
    return toks.select(
        id_col,
        F.size("w").cast("long").alias("n_words"),
        F.size("t").cast("long").alias("n_tokens"),
        F.slice("t", 1, 12).alias("token_prefix"),
    )
