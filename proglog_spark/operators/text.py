"""Text-analysis operators for training-data pipelines.

Everything here is built-in-function only (split / regexp /
higher-order functions) — fully inside whole-stage codegen, no Python
on the data path. Each operator has a deterministic, integer-output
design so it can be hash-checked against the DuckDB oracle
(FIXTURES.md §3): ratios are emitted as ``floor(1e6 * a / b)``
("micro" fixed-point — one double division + floor is bit-identical
across engines), and all hashes derive from md5 (the one digest both
engines share).

The reference has no text functions at all (its payloads are opaque
bytes — SURVEY.md §2.0b "scalar fns: only codecs"); these operators
are the north-star LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tokenizer contract (shared with the oracle): whitespace split for
# n_tokens_ws; this regex for the BPE-ish token stream. Alternation +
# char classes only, so Java regex (Spark) and RE2 (DuckDB) agree.
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

# Small fixed stopword list for quality scoring (lowercase match).
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]

FNV_MOD = 2147483647  # 2^31 - 1, Mersenne prime for the rolling hash


def token_hash32(tok: Column, salt: str = "") -> Column:
    """Deterministic 32-bit token hash: first 8 hex digits of md5.

    md5 is the only digest Spark and DuckDB both provide, so it is the
    shared hash foundation for fingerprints, simhash and minhash.
    """
    salted = F.concat(F.lit(salt), tok) if salt else tok
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens, regex tokens, distinct tokens."""
    c = F.col(text_col)
    return df.select(
        "*",
        (F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit(""))) + F.lit(1))
        .cast("long")
        .alias("n_tokens_ws"),
        F.regexp_count(c, F.lit(TOKEN_REGEX)).cast("long").alias("n_tokens_re"),
        F.size(F.array_distinct(F.split(c, " "))).cast("long").alias("n_distinct_tokens"),
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: stopword density, punctuation, repetition.

    All outputs integer (counts or micro-ratios) for oracle parity.
    ``stopword_micro`` ≈ classic stopword-ratio quality filter;
    ``distinct_micro`` low ⇒ repetitive/boilerplate text.
    """
    c = F.col(text_col)
    toks = F.split(c, " ")
    n_tokens = F.size(toks).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("long")
    n_punct = F.regexp_count(c, F.lit("[^a-zA-Z0-9 ]")).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    micro = lambda num, den: F.floor(F.lit(1000000.0) * num / den).cast("long")  # noqa: E731
    return df.select(
        "*",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_punct.alias("n_punct"),
        micro(n_stop, n_tokens).alias("stopword_micro"),
        micro(n_distinct, n_tokens).alias("distinct_micro"),
    )


# Marker tokens per language for the n-gram/marker language-ID
# heuristic. Ties break by list order (en first).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "is"],
    "es": ["el", "la", "los"],
    "de": ["der", "und", "das"],
    "fr": ["le", "les", "des"],
    "zh": ["de", "shi", "le"],
}


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language ID: argmax of marker hit counts.

    Deterministic: scores tie-break by the fixed language order above.
    (On the synthetic fixtures every language shares one vocabulary,
    so predictions mostly collapse to the tie-break — the operator's
    value is its contract + plumbing, verified against the oracle
    computing the identical heuristic.)
    """
    c = F.col(text_col)
    toks = F.split(c, " ")
    scores = [
        F.size(
            F.filter(toks, lambda t: F.array_contains(F.array(*[F.lit(m) for m in marks]), t))
        ).cast("long").alias(f"score_{lang}")
        for lang, marks in LANG_MARKERS.items()
    ]
    scored = df.select("*", *scores)
    # argmax with deterministic tie-break = greatest over (score, rank) pairs
    langs = list(LANG_MARKERS)
    best = F.greatest(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("s"),
                F.lit(len(langs) - i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    return scored.withColumn("predicted_lang", best["lang"]).drop(
        *[f"score_{lang}" for lang in langs]
    )


# PII scrubbing: pattern -> redaction token, applied in this order
# (URLs first so their path segments are not re-matched as emails/IPs).
# Patterns use only syntax Java regex (Spark) and RE2 (DuckDB) share:
# char classes, bounded repetition, \d, \b.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "url": (r"https?://[A-Za-z0-9._/%-]+", "<URL>"),
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+\d{1,3}-\d{3}-\d{3}-\d{4}", "<PHONE>"),
}


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction for training-data curation, JVM-side only.

    Adds per-pattern match counts (``n_url``/``n_email``/``n_ipv4``/
    ``n_phone``, each counted independently on the ORIGINAL text) and a
    ``redacted`` column where every match is replaced by its token, in
    the fixed PII_PATTERNS order. Pure ``regexp_count``/
    ``regexp_replace`` — whole-stage codegen, no Python on the data
    path, embarrassingly parallel (no shuffle) at any scale.
    """
    c = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, (pat, _tok) in PII_PATTERNS.items()
    ]
    red = c
    for _name, (pat, tok) in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, tok)
    return df.select("*", *counts, red.alias("redacted"))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Polynomial rolling-hash document fingerprint.

    fp = fold(tokens, acc -> (acc*31 + h32(token)) mod (2^31-1)) —
    a Karp-Rabin style content fingerprint, seeded with 0. NOTE:
    token hashes are 32-bit and may exceed p = 2^31-1, so the seed
    matters on 1-token docs — the DuckDB oracle prepends the 0 seed
    (bare list_reduce would seed with the raw first hash, unreduced).
    """
    toks = F.split(F.col(text_col), " ")
    fp = F.aggregate(
        F.transform(toks, lambda t: token_hash32(t)),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(31) + h) % F.lit(FNV_MOD),
    )
    return df.withColumn("fingerprint", fp)


#: docs-per-block budget the fuzzy-match blocking ladder targets —
#: with ~20 sources × (~550 chars / width) size buckets, occupancy is
#: ≈ n·width/11000, so each ladder rung halves/fifths the size-bucket
#: width as the corpus doubles/quintuples past n·width ≈ 550k.
_BLOCK_WIDTH_LADDER = (
    (5_500, 100),
    (11_000, 50),
    (27_500, 20),
    (55_000, 10),
    (110_000, 5),
    (275_000, 2),
)
_BLOCK_PREFIX_LADDER = (550_000, 5_500_000, 55_000_000, 550_000_000)


def adaptive_block_params(n: int) -> tuple[int, int]:
    """Corpus-adaptive fuzzy-match blocking: ``(size-bucket width,
    exact-prefix chars)`` for a corpus of ``n`` documents.

    With CORPUS-INDEPENDENT blocking keys the within-block pair count
    grows n² (SCALING §11 measured 1814× work at 100× on the fixed
    ``n_chars div 100`` key) — the same class adaptive_lsh_bits fixed
    for the LSH self-joins. Here the selectivity dial has two stages:
    the size-bucket WIDTH shrinks with n (100 chars down to 1), and
    past the width floor the block key grows ``plen`` exact-prefix
    characters (record-linkage multi-key blocking). Both ladders are
    pure integer comparisons on n, replayed verbatim by the SQL
    oracle's CASE chains. Narrower blocks trade recall (a qualifying
    pair straddling a boundary is missed) for linear candidate growth
    — the same dial every blocking scheme exposes; both engines
    replay the SAME dial, so the emitted pair set stays
    hash-comparable at every corpus size.
    """
    width = 1
    for hi, w in _BLOCK_WIDTH_LADDER:
        if n <= hi:
            width = w
            break
    plen = len(_BLOCK_PREFIX_LADDER)
    for j, hi in enumerate(_BLOCK_PREFIX_LADDER):
        if n <= hi:
            plen = j
            break
    return width, plen


def lm_transition_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-trained bigram language-model scoring — the integer-exact
    analog of CCNet-style perplexity filtering for training-data
    curation: (id, n_bigrams, mean_transition_micro,
    n_singleton_bigrams).

    The model IS the corpus: c2(w1,w2) = corpus count of the bigram,
    c1(w1) = count of transitions leaving w1 (Σ_w2 c2), and the
    transition probability is the exact integer p_micro =
    (c2·10⁶) div c1. A document's score is the k-weighted mean of its
    bigrams' p_micro (fluent, repetitive text scores high; incoherent
    token soup scores low); n_singleton_bigrams counts transitions
    seen nowhere else in the corpus (a strong junk/garble signal).
    Every value is BIGINT (c2·10⁶ stays under 2⁶³ through ~10¹² corpus
    bigrams), so the full train-and-score pipeline hash-matches a SQL
    oracle.

    Plan shape at 100 TB: one explode (no shuffle) → partial-agg
    shuffle on (id, w1, w2); the model derives from that table by two
    further reductions on (w1, w2) and (w1) — each carries distinct
    bigrams, not occurrences — and scoring is one shuffle join back on
    (w1, w2) (AQE skew-join splits the stopword-pair hotspots). Docs
    with fewer than two words have no transitions and no output row.
    """
    w = df.select(
        F.col(id_col).alias("_id"),
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("ws"),
    ).where(F.size("ws") >= 2)  # sequence(1, 0) is DESCENDING — guard
    db = (
        w.select(
            "_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1), "
                    "i -> struct(element_at(ws, i) AS w1, "
                    "element_at(ws, i + 1) AS w2))"
                )
            ).alias("p"),
        )
        .select("_id", "p.w1", "p.w2")
        .groupBy("_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    bg = db.groupBy("w1", "w2").agg(F.sum("k").alias("c2"))
    ug = bg.groupBy("w1").agg(F.sum("c2").alias("c1"))
    model = bg.join(ug, "w1").select(
        "w1", "w2", "c2", F.expr("(c2 * 1000000) div c1").alias("p_micro")
    )
    return (
        db.join(model, ["w1", "w2"])
        .groupBy("_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.expr("sum(k * p_micro) div sum(k)").alias("mean_transition_micro"),
            F.sum(F.when(F.col("c2") == 1, F.col("k")).otherwise(F.lit(0))).alias(
                "n_singleton_bigrams"
            ),
        )
        .withColumnRenamed("_id", id_col)
    )


def lm_interpolated_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Jelinek-Mercer interpolated trigram LM scoring, integer-exact:
    (id, n_trigrams, mean_interp_micro, n_singleton_trigrams).

    The smoothing the bigram tier (:func:`lm_transition_scores`) lacks:
    p(w3 | w1 w2) = 0.5·p3 + 0.3·p2 + 0.2·p1 with
    p3 = c3(w1w2w3)/c2(w1w2), p2 = c2(w2w3)/c1(w2), p1 = c1(w3)/N —
    all counts trained on the corpus itself, each term the exact
    integer (c·10⁶) div ctx and the mixture
    (5·p3 + 3·p2 + 2·p1) div 10, so train-and-score hash-matches a SQL
    oracle end to end. Every context count is ≥ 1 by construction (a
    trigram's prefix bigram occurs in the bigram stream; its middle
    and last words occur in the unigram stream), so no division
    guards are needed. Docs with < 3 words emit no row.

    Plan shape at 100 TB: three explode→partial-agg reductions build
    the count tables (each shuffles distinct n-grams, not
    occurrences); the model assembles with three n-gram-keyed shuffle
    joins plus a 1-row broadcast total; scoring is one join back on
    the trigram key. AQE skew-split covers stopword-trigram hotspots.
    """
    w = df.select(
        F.col(id_col).alias("_id"),
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("ws"),
    )
    u = w.select(F.explode("ws").alias("t"))
    uni = u.groupBy("t").agg(F.count(F.lit(1)).alias("c1"))
    tot = u.agg(F.count(F.lit(1)).alias("n"))
    big = (
        w.where(F.size("ws") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1), "
                    "i -> struct(element_at(ws, i) AS w1, "
                    "element_at(ws, i + 1) AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    dt = (
        w.where(F.size("ws") >= 3)
        .select(
            "_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 2), "
                    "i -> struct(element_at(ws, i) AS w1, "
                    "element_at(ws, i + 1) AS w2, "
                    "element_at(ws, i + 2) AS w3))"
                )
            ).alias("p"),
        )
        .select("_id", "p.w1", "p.w2", "p.w3")
        .groupBy("_id", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    tri = dt.groupBy("w1", "w2", "w3").agg(F.sum("k").alias("c3"))
    bp = big.select("w1", "w2", F.col("c2").alias("c2p"))
    bs = big.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("c2").alias("c2s")
    )
    u2 = uni.select(F.col("t").alias("w2"), F.col("c1").alias("c1m"))
    u3 = uni.select(F.col("t").alias("w3"), F.col("c1").alias("c1l"))
    model = (
        tri.join(bp, ["w1", "w2"])
        .join(bs, ["w2", "w3"])
        .join(u2, "w2")
        .join(u3, "w3")
        .join(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "w3",
            "c3",
            F.expr("(c3 * 1000000) div c2p").alias("p3"),
            F.expr("(c2s * 1000000) div c1m").alias("p2"),
            F.expr("(c1l * 1000000) div n").alias("p1"),
        )
    )
    return (
        dt.join(model, ["w1", "w2", "w3"])
        .groupBy("_id")
        .agg(
            F.sum("k").alias("n_trigrams"),
            F.expr(
                "sum(k * ((5 * p3 + 3 * p2 + 2 * p1) div 10)) div sum(k)"
            ).alias("mean_interp_micro"),
            F.sum(F.when(F.col("c3") == 1, F.col("k")).otherwise(F.lit(0))).alias(
                "n_singleton_trigrams"
            ),
        )
        .withColumnRenamed("_id", id_col)
    )


def bm25_topk(
    df: DataFrame,
    term_queries: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    tf: DataFrame | None = None,
) -> DataFrame:
    """BM25-shaped retrieval over whitespace tokens, integer-exact:
    top-k ``(query_id, doc_id, score_micro, rank)`` per query.

    Okapi BM25 with k1 = 1.2, b = 0.75, both cleared to integers
    (×20), and the float idf replaced by the RATIONAL surrogate
    idf_s = ((N − df + 1)·10⁶) div (df + 1) — monotone in the true
    log-idf, so rankings agree wherever idf margins exceed one
    quantization step, and every engine computes the identical BIGINT.
    Per matched (query, doc, term):

        rel20  = (18·dl·N) div S            -- 18·(dl/avgdl), avgdl = S/N
        tf_n   = (tf·44·10⁶) div (20·tf + 6 + rel20)
        score += (idf_s · tf_n) div 10⁶

    Fixed-point budget: idf_s·tf_n ≤ 2.2·10¹²·N must fit int64, so
    the micro grid holds to ~4M documents per corpus; above that,
    drop the idf scale a decade per 10× docs (the ordering, which is
    what BM25 is for, survives rescaling).

    Plan shape at 100 TB: tf/dl/df are explode → partial-agg
    reductions (distinct (doc, term) pairs shuffle, never token
    occurrences); the query-term table and the two 1-row totals
    broadcast; scoring joins tf→dl on the doc key; the final top-k is
    the two-phase per-query rank (no global window).

    ``tf`` (r11): optional pre-computed term-frequency table
    ``(_id, term, tf)`` — EXACTLY what the internal tokenize+groupBy
    produces over ``df``. When a session runs several BM25 consumers
    over the same corpus, passing a shared cached tf table skips the
    per-consumer corpus tokenize pass; the caller owns the
    one-materialization guarantee (cache or checkpoint). Statistics
    and scoring are unchanged — ``n`` still counts ``df``'s rows.
    """
    from proglog_spark.operators.topk import topk_per_key

    if tf is None:
        toks = df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            ).alias("term"),
        )
        # tf is the ONLY aggregate computed from the exploded token
        # stream; dl, df, and the corpus token total S all derive from
        # it, so the full corpus is tokenized exactly once. The eager
        # localCheckpoint makes that physical, not just logical: tf has
        # three consumers with DIFFERENT partitionings (term join, _id
        # agg, term agg), and AQE's exchange reuse only deduplicated
        # one of them — without the checkpoint the token explode re-ran
        # per branch.
        tf = (
            toks.groupBy("_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .localCheckpoint(eager=True)
        )
    dl = tf.groupBy("_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    totals = df.agg(F.count(F.lit(1)).alias("n")).join(
        dl.agg(F.sum("dl").alias("s"))
    )
    qt = df.sparkSession.createDataFrame(term_queries, "query_id long, term string")
    return _bm25_rank(tf, dl, dfreq, totals, qt, k, id_col)


def _bm25_rank(tf, dl, dfreq, totals, qt, k: int, id_col: str):
    """The BM25 scoring tail shared by the direct path
    (:func:`bm25_topk`) and the persisted-index path
    (:func:`bm25_index_query`): identical integer arithmetic, so the
    two paths return byte-identical rankings from the same statistics.
    Inputs: tf(_id, term, tf), dl(_id, dl), dfreq(term, df),
    totals(n, s) 1-row, qt(query_id, term)."""
    from proglog_spark.operators.topk import topk_per_key

    contrib = (
        tf.join(F.broadcast(qt), "term")
        .join(dl, "_id")
        .join(dfreq, "term")
        .join(F.broadcast(totals))
        .select(
            "query_id",
            "_id",
            F.expr(
                "(((n - df + 1) * 1000000) div (df + 1)) * "
                "((tf * 44 * 1000000) div (20 * tf + 6 + (18 * dl * n) div s)) "
                "div 1000000"
            ).alias("contrib"),
        )
    )
    scored = contrib.groupBy("query_id", "_id").agg(
        F.sum("contrib").alias("score_micro")
    )
    return (
        topk_per_key(
            scored,
            ["query_id"],
            [F.col("score_micro").desc(), F.col("_id")],
            k,
            rank_col="rank",
        )
        .withColumnRenamed("_id", id_col)
        .select("query_id", id_col, "score_micro", "rank")
    )


def bm25_index_write(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    term_partitions: int | None = None,
    tf: DataFrame | None = None,
) -> None:
    """Materialize a persistent BM25 inverted index: tokenize ONCE,
    persist the four statistics tables a query needs — the
    build-offline/query-online pattern of :func:`build_ivf_index`
    (index once; every query afterwards reads statistics, never the
    corpus text).

    Layout IS the index: ``tf/`` is range-partitioned and sorted by
    term, so each parquet file covers a term range and a query's
    ``term IN (...)`` pushdown prunes to the files whose footer
    min/max straddle its terms — the Spark-native analog of an
    inverted index's term dictionary. ``dl/`` stays doc-keyed (the
    postings→length join is on the doc id), ``df/`` term-keyed,
    ``totals/`` one row.

    ``tf`` (r11): optional pre-computed ``(doc_id, term, tf)`` table,
    byte-for-byte what the internal tokenize+groupBy produces over
    ``df`` — same sharing contract as :func:`bm25_topk`.
    """
    if tf is None:
        toks = df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            ).alias("term"),
        )
        tf = (
            toks.groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .localCheckpoint(eager=True)  # one tokenize feeds all four tables
        )
    if term_partitions is None:
        # corpus-adaptive file count (~4M postings per file): a fixed
        # default would mean ever-fatter files as the corpus grows —
        # the corpus-independent-knob disease the adaptive ladders fix
        # elsewhere; the count is one cheap job over the checkpointed tf
        term_partitions = max(8, tf.count() // 4_000_000 + 1)
    (
        tf.repartitionByRange(term_partitions, "term")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(f"{path}/tf")
    )
    tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")).write.mode(
        "overwrite"
    ).parquet(f"{path}/dl")
    tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).write.mode(
        "overwrite"
    ).parquet(f"{path}/df")
    df.agg(F.count(F.lit(1)).alias("n")).join(
        tf.agg(F.sum("tf").alias("s"))
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/totals")


def bm25_index_query(
    spark,
    path: str,
    term_queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Query a persisted BM25 index: identical output to
    :func:`bm25_topk` over the indexed corpus (same integer scoring
    tail), but the corpus TEXT is never read — the query's terms
    become pushed IN-filters on the term-sorted ``tf``/``df`` tables
    (file/row-group pruning via footer min-max), the postings join dl
    on the doc key, and the two totals broadcast. Query cost scales
    with the matched postings, not the corpus."""
    terms = sorted({t for _, t in term_queries})
    tf = (
        spark.read.parquet(f"{path}/tf")
        .where(F.col("term").isin(terms))
        .withColumnRenamed("doc_id", "_id")
    )
    dl = spark.read.parquet(f"{path}/dl").withColumnRenamed("doc_id", "_id")
    dfreq = spark.read.parquet(f"{path}/df").where(F.col("term").isin(terms))
    totals = spark.read.parquet(f"{path}/totals")
    qt = spark.createDataFrame(term_queries, "query_id long, term string")
    return _bm25_rank(tf, dl, dfreq, totals, qt, k, id_col)


def dsir_topk(
    df: DataFrame,
    is_target: Column,
    k: int = 100,
    n_buckets: int = 10007,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_features: DataFrame | None = None,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): rank raw
    documents by how target-like their hashed-bigram feature
    distribution is, and keep the top ``k``.

    The published method fits two bag-of-hashed-ngrams models —
    p_target and p_raw — and weighs each doc by its log likelihood
    ratio. This implementation keeps the estimator but swaps the
    per-feature log-ratio for the integer-exact mean likelihood ratio
    on the micro grid (the repo's oracle-gating convention, same as
    the LM scorers):

        ratio_micro(f) = ((t_f+1) * (R+B) * 10^6) div ((r_f+1) * (T+B))
        dsir_micro(d)  = sum_f k_f * ratio_micro(f) div sum_f k_f

    with t_f/r_f the target/raw feature counts, T/R their totals, B
    the bucket count (Laplace smoothing over the fixed hashed
    vocabulary — exactly the paper's smoothed multinomials), and k_f
    the doc's feature counts. NOTE this is a deliberate RANKING-RULE
    SUBSTITUTION, not an order-preserving transform of the published
    score: a weighted arithmetic mean of per-feature likelihood
    ratios is not monotone in the paper's sum of per-feature
    log-ratios, so the selected top-k can differ from Xie et al.'s on
    the same corpus. The substitution is chosen because it runs on
    the same sufficient statistics (the two smoothed multinomials)
    while staying integer-exact — which is what lets the whole
    selection sit inside the DuckDB hash gate instead of a
    float-tolerance comparison. Selection = top-k by (score, doc_id).

    Scale posture — the reason DSIR hashes features: the MODEL is at
    most ``n_buckets`` rows no matter the corpus size, so the
    join-back broadcasts; the only corpus-scale shuffles are the two
    feature-count reductions (map-side combinable). Features are word
    bigrams hashed with the portable :func:`token_hash32` (md5-based,
    so the DuckDB oracle reproduces bucket ids bit-for-bit).

    BIGINT bound: (t_f+1)*(R+B)*10^6 stays below 2^63 while
    t_f*R < 9.2e12 — past that (deep-trillions of tokens), lift the
    two products to DECIMAL(38,0); the plan does not change.

    ``doc_features`` (r11): optional pre-computed per-doc feature
    table ``(id, is_tgt, bk, k)`` — exactly what the internal
    featurize produces over ``df`` (same bucket space, same
    is_target labeling). When a session runs several DSIR consumers
    over the same corpus, passing a shared cached table skips the
    per-consumer featurize pass; the caller owns the
    one-materialization guarantee.
    """
    if doc_features is not None:
        doc_f = doc_features
    else:
        # eager checkpoint (the bm25_topk tf precedent): doc_f feeds
        # the model counts, the totals, AND the scoring join — without
        # materialization Spark re-executes the corpus explode per
        # consumer (a 3× corpus scan, caught by the plan pin)
        doc_f = _dsir_doc_features(
            df, n_buckets, text_col, id_col, is_target
        ).localCheckpoint(eager=True)
    model = _dsir_fit(_dsir_bucket_counts(doc_f), n_buckets)
    return (
        _dsir_score(doc_f, model, id_col)
        .orderBy(F.col("dsir_micro").desc(), id_col)
        .limit(k)
    )


def _dsir_doc_features(
    df: DataFrame,
    n_buckets: int,
    text_col: str,
    id_col: str,
    is_target=None,
) -> DataFrame:
    """Per-doc hashed-bigram feature counts: (id, [is_tgt,] bk, k).
    One explode pass over the token stream; everything downstream
    (model fit AND scoring) reduces from this table, whose cardinality
    is distinct (doc, bucket) pairs — far below the raw token
    stream."""
    tgt = ["is_tgt"] if is_target is not None else []
    feats = (
        df.select(
            id_col,
            *([is_target.alias("is_tgt")] if is_target is not None else []),
            F.filter(F.split(text_col, " "), lambda w: w != "").alias("ws"),
        )
        .where(F.size("ws") >= 2)
        .select(
            id_col,
            *tgt,
            F.explode(
                F.expr(
                    # transform's i and [] indexing are both 0-based:
                    # slice element i is ws[i], its successor ws[i+1]
                    "transform(slice(ws, 1, size(ws) - 1), "
                    "(w, i) -> concat(w, ' ', ws[i + 1]))"
                )
            ).alias("bg"),
        )
        .select(
            id_col,
            *tgt,
            F.pmod(token_hash32(F.col("bg")), F.lit(n_buckets)).alias("bk"),
        )
    )
    return feats.groupBy(id_col, *tgt, "bk").agg(F.count(F.lit(1)).alias("k"))


def _dsir_bucket_counts(doc_f: DataFrame) -> DataFrame:
    """Per-bucket (rc, tc) raw/target counts from an is_tgt-carrying
    feature table — at most n_buckets rows."""
    return doc_f.groupBy("bk").agg(
        F.sum("k").alias("rc"),
        F.sum(F.when(F.col("is_tgt"), F.col("k")).otherwise(0)).alias("tc"),
    )


def _dsir_fit(raw: DataFrame, n_buckets: int) -> DataFrame:
    """Fit the per-bucket likelihood-ratio model from the (bk, rc, tc)
    bucket-count table: (bk, ratio_micro), at most ``n_buckets``
    rows."""
    totals = raw.agg(
        F.sum("rc").cast("long").alias("R"), F.sum("tc").cast("long").alias("T")
    )
    return raw.crossJoin(F.broadcast(totals)).select(
        "bk",
        F.expr(
            f"CAST(((tc + 1) * (R + {n_buckets}) * 1000000) div "
            f"((rc + 1) * (T + {n_buckets})) AS BIGINT)"
        ).alias("ratio_micro"),
    )


def _dsir_score(
    doc_f: DataFrame,
    model: DataFrame,
    id_col: str,
    default_ratio: int | None = None,
) -> DataFrame:
    """Shared scoring tail (direct and persisted-model paths run this
    byte-identically): broadcast the ≤ n_buckets-row model onto the
    per-doc feature table. Unordered (id, n_feats, dsir_micro).

    ``default_ratio`` is the smoothed ratio of a NEVER-OBSERVED bucket
    (both Laplace pseudocounts at 1) — required when scoring data the
    model was not fitted on, where new buckets must get the smoothing
    floor instead of silently dropping from the join. The in-session
    fit-and-score path leaves it None (every scored bucket exists in
    the model by construction, and the SQL oracle's inner join says
    the same)."""
    joined = (
        doc_f.join(F.broadcast(model), "bk")
        if default_ratio is None
        else doc_f.join(F.broadcast(model), "bk", "left").withColumn(
            "ratio_micro",
            F.coalesce(F.col("ratio_micro"), F.lit(int(default_ratio))),
        )
    )
    return joined.groupBy(id_col).agg(
        F.sum("k").cast("long").alias("n_feats"),
        F.expr("CAST(sum(k * ratio_micro) div sum(k) AS BIGINT)").alias(
            "dsir_micro"
        ),
    )


def dsir_model_write(
    df: DataFrame,
    is_target,
    path: str,
    n_buckets: int = 10007,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_features: bool = False,
    doc_features: DataFrame | None = None,
) -> DataFrame | None:
    """Persist a fitted DSIR model — the train-once/score-forever
    pattern of :func:`bm25_index_write` and `pq.build_ivf_index`: fit
    the hashed-bigram likelihood-ratio model on a labeled corpus
    sample and write it as ONE parquet file (the model is ≤ n_buckets
    rows by construction — DSIR's whole point), plus a one-row meta
    table pinning n_buckets so scorers can't silently hash into a
    different bucket space. Incremental pipelines then score each new
    data drop against the frozen model without ever re-reading the
    training corpus.

    With ``keep_features=True``, returns the MATERIALIZED per-doc
    feature table so a score-after-train composition over the SAME
    corpus (`dsir_model_score`'s ``doc_features``) reuses it instead
    of re-featurizing — the write path already paid for the one
    corpus scan. This is opt-in because the feature table is
    O(distinct (doc, bucket) pairs) — corpus-scale, unlike the
    ≤ n_buckets-row model — and pinning it in executor storage is
    only worth it for callers that actually score the training corpus
    next. Train-only / new-data pipelines leave the default and only
    the bucket-count reduction materializes (the function's bounded
    scale posture). Scoring genuinely NEW data featurizes that data
    itself (it must — the features don't exist yet).

    ``doc_features`` (r11): optional pre-computed ``(id, is_tgt, bk,
    k)`` table, exactly the internal featurize's output over ``df`` —
    the :func:`dsir_topk` sharing contract; with ``keep_features``
    the provided table is what is handed back."""
    if doc_features is not None:
        doc_f = doc_features
    elif keep_features:
        # checkpoint the per-doc feature table itself: it feeds the
        # model counts, the totals, AND — handed back to the caller —
        # same-corpus scoring, all from ONE featurize pass
        doc_f = _dsir_doc_features(
            df, n_buckets, text_col, id_col, is_target
        ).localCheckpoint(eager=True)
    else:
        doc_f = _dsir_doc_features(df, n_buckets, text_col, id_col, is_target)
    raw = _dsir_bucket_counts(doc_f).localCheckpoint(eager=True)
    _dsir_fit(raw, n_buckets).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/model"
    )
    # meta pins the bucket space AND the never-observed-bucket ratio
    # (both Laplace pseudocounts at 1): new data scored against the
    # frozen model needs the smoothing floor for buckets the training
    # corpus never produced
    t = raw.agg(
        F.sum("rc").cast("long").alias("R"), F.sum("tc").cast("long").alias("T")
    ).collect()[0]
    default_ratio = ((t["R"] + n_buckets) * 1_000_000) // (t["T"] + n_buckets)
    # one-row meta via a single-partition JVM range, NOT
    # createDataFrame([...]).coalesce(1): a local-relation DataFrame
    # parallelizes over defaultParallelism Python-RDD partitions, and
    # coalesce(1) then drains all of them SEQUENTIALLY through one
    # task's Python-worker round-trips (~150 ms each = ~5 s of pure
    # overhead for one row; measured r6). range(0,1,1,1) is one JVM
    # task, ~0.2 s.
    df.sparkSession.range(0, 1, 1, 1).select(
        F.lit(int(n_buckets)).cast("long").alias("n_buckets"),
        F.lit(int(default_ratio)).cast("long").alias("default_ratio"),
    ).write.mode("overwrite").parquet(f"{path}/meta")
    return doc_f if keep_features else None


def dsir_model_score(
    spark,
    path: str,
    df: DataFrame,
    k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_features: DataFrame | None = None,
) -> DataFrame:
    """Score a corpus against a persisted DSIR model: identical output
    to the in-session path over the same model (same feature hash,
    same integer scoring tail). ``k=None`` returns every doc's score
    (the filter-stage spelling); ``k`` set returns the top-k selection
    exactly like :func:`dsir_topk`.

    ``doc_features`` short-circuits the featurize pass with a table
    the caller already owns — the :func:`dsir_model_write` return
    value, for the train-then-score-the-training-set composition.
    The caller is responsible for it being ``df``'s feature table in
    the MODEL's bucket space (the write path guarantees both); the
    extra ``is_tgt`` column it carries is ignored by the scoring
    groupBy."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    n_buckets = int(meta["n_buckets"])
    model = spark.read.parquet(f"{path}/model")
    doc_f = (
        doc_features
        if doc_features is not None
        else _dsir_doc_features(df, n_buckets, text_col, id_col)
    )
    scored = _dsir_score(
        doc_f, model, id_col, default_ratio=int(meta["default_ratio"])
    )
    if k is None:
        return scored
    return scored.orderBy(F.col("dsir_micro").desc(), id_col).limit(k)


def keyed_string(key_col: Column) -> Column:
    """The family-wide NULL-key sentinel: cast to string with NULL
    mapped to an explicit out-of-band value, so every hash-keyed
    operator (sampling, splits, placement, dedup) treats NULL keys the
    SAME deterministic way — a bare hash of NULL is NULL, which would
    silently drop or mis-route null-key rows differently per operator.
    Single-sources the expression that several operators previously
    inlined verbatim (the cross-engine determinism contract lives
    here; DuckDB replay: ``coalesce(CAST(k AS VARCHAR), chr(0) ||
    '<null>')``)."""
    return F.coalesce(key_col.cast("string"), F.lit("\x00<null>"))
