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


def train_bpe_driver(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 20,
    min_pair_count: int = 2,
    max_train_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Large-vocabulary BPE training: ONE Spark reduction, zero jobs
    per merge.

    :func:`train_bpe` runs two vocabulary-sized Spark jobs per merge —
    fine at 20 merges, a driver-side scheduling bottleneck at a 50k
    vocabulary (~100k jobs). But BPE statistics are a pure function of
    the (distinct word, count) table, which the corpus pass already
    reduces to; this variant collects that table (bounded and
    deterministic: top ``max_train_words`` by count desc, word — the
    same train-on-a-bounded-sample discipline as
    ``similarity.ivf_train_sample``, and how production tokenizers
    train) and runs the classic incremental merge loop in memory:
    a lazy max-heap over pair counts plus a pair→word inverted index,
    so each merge touches only the words containing its pair. Total
    Spark jobs: 2 (aggregate + collect) at ANY vocabulary size.

    Identical merge sequence to :func:`train_bpe` (count desc, then
    pair-lexicographic tie-break — the heap key is (-count, a, b))
    whenever the corpus has ≤ ``max_train_words`` distinct words;
    above the cap the tail of the Zipf distribution is excluded from
    the statistics, which is the standard trade. Use the distributed
    loop when exact full-table statistics matter more than job count.
    """
    rows = (
        word_freq_table(df, text_col)
        .orderBy(F.col("n").desc(), "word")
        .limit(max_train_words)
        .collect()
    )
    words = [list(r["word"]) + [END] for r in rows]
    counts = [int(r["n"]) for r in rows]
    return _merge_loop_inmemory(words, counts, num_merges, min_pair_count)


def _merge_loop_inmemory(
    words: list[list[str]],
    counts: list[int],
    num_merges: int,
    min_pair_count: int,
) -> list[tuple[str, str]]:
    """Sequential BPE over weighted symbol sequences with incremental
    pair-count maintenance: per merge, only the words in the merged
    pair's inverted-index bucket are rewritten and only their pair
    counts adjusted. Heap entries go stale when counts change; a
    popped entry is validated against the live count and re-pushed if
    stale (lazy deletion), so ordering stays exact."""
    import collections
    import heapq

    pair_counts: dict[tuple[str, str], int] = collections.Counter()
    index: dict[tuple[str, str], set[int]] = collections.defaultdict(set)
    for wi, s in enumerate(words):
        n = counts[wi]
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            pair_counts[p] += n
            index[p].add(wi)
    heap = [(-c, a, b) for (a, b), c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while heap and len(merges) < num_merges:
        nc, a, b = heapq.heappop(heap)
        cur = pair_counts.get((a, b), 0)
        if -nc != cur:  # stale entry: re-enter at the live count
            if cur > 0:
                heapq.heappush(heap, (-cur, a, b))
            continue
        if cur < min_pair_count:
            break
        merges.append((a, b))
        changed: set[tuple[str, str]] = set()
        for wi in index.pop((a, b), ()):  # only words holding the pair
            s = words[wi]
            new = merge_pair(s, a, b)
            if new == s:
                continue  # stale index entry (pair merged away earlier)
            n = counts[wi]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                left = pair_counts[p] - n
                if left > 0:
                    pair_counts[p] = left
                    changed.add(p)
                else:
                    pair_counts.pop(p, None)
                    changed.discard(p)
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
                index[p].add(wi)
                changed.add(p)
            words[wi] = new
        for p in changed:
            heapq.heappush(heap, (-pair_counts[p], p[0], p[1]))
    return merges


def encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list: (id, n_words, n_tokens, tokens
    prefix). One Arrow-batched pass over the corpus, merges applied
    per word in learned order (the standard greedy BPE encoder).
    ``token_prefix`` is the first 12 tokens SPACE-joined to a scalar:
    words are split on ' ' so no token can contain the separator, and
    scalar final columns are the driver-canonicalization contract
    (SURVEY §2.1) — array cells break pandas sort/hash harnesses."""
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
        F.array_join(F.slice("t", 1, 12), " ").alias("token_prefix"),
    )
