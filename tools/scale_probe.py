#!/usr/bin/env python
"""Scale probe — do the plans hold at 10x the benchmark size?

Synthesizes a K-fold replica of the sf0.1 fixtures into a scratch dir
(key columns shifted per replica so joins/groups keep their
selectivity; document TOKENS are suffixed per replica so the dedup
family sees a 10x corpus, not 10 exact copies of one corpus — exact
copies would be a duplication stress test, which `docs_dedup_exact`
covers, not a scale test), then times a chosen query subset at 1x and
Kx and prints the wall-clock ratio per query.

A healthy ratio for a linear operator on local[32] is <= K (fixed
driver/job overhead amortizes, so often well under K); a ratio far
above K flags super-linear work — the thing to fix before a real
100x. Results are recorded in SCALING.md §8.

Usage: python tools/scale_probe.py [--k 10] [--sf /root/testdata/sf0.1]
       [--only q1,q2,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

# scale-suspect set: self-joins, windows, global ranks, gram builds,
# runtime filters, distinct structures, iterative driver loops
DEFAULT_QUERIES = [
    "docs_neardup_jaccard",
    "docs_minhash_lsh",
    "docs_repeated_span_dedup",
    "docs_top_terms",
    "docs_curation_pipeline",
    "tpch_bloom_filter_join",
    "tpch_q21_last_shipper",
    "events_trailing_hour_count",
    "events_rolling_wau",
    "events_type_value_quantiles",
    "events_bitmap_distinct",
    "lineitem_profile",
    "emb_lsh_ann_topk",
    "docs_length_quantiles",
]

# Key DOMAINS: every column referencing a domain shifts by the SAME
# per-replica span (max over all member columns + 1), so primary and
# foreign keys stay aligned — joins keep their exact selectivity at
# Kx volume. nation/region stay single-copy (broadcast dims), and
# their FK columns are left unshifted everywhere.
DOMAINS = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "userkey": [("events", "user_id")],
    "eventkey": [("events", "event_id")],
    "dockey": [("documents", "doc_id")],
    "veckey": [("embeddings", "vec_id")],
}
SINGLE_COPY = ["nation", "region"]


def replicate(spark, sf_dir: str, out_dir: str, k: int) -> None:
    from proglog_spark.sources.tables import load_table

    table_cols: dict[str, list[tuple[str, str]]] = {}
    span: dict[str, int] = {}
    for domain, members in DOMAINS.items():
        mx = 0
        for t, col in members:
            table_cols.setdefault(t, []).append((col, domain))
            v = load_table(spark, sf_dir, t).agg(F.max(col)).collect()[0][0]
            mx = max(mx, int(v))
        span[domain] = mx + 1

    for t in SINGLE_COPY:
        load_table(spark, sf_dir, t).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
    for t, cols in table_cols.items():
        df = load_table(spark, sf_dir, t)
        parts = []
        for r in range(k):
            part = df
            for col, domain in cols:
                part = part.withColumn(col, F.col(col) + r * span[domain])
            if t == "documents" and r > 0:
                # new vocabulary per replica: a 10x corpus, not 10
                # copies (every token suffixed -> every shingle new)
                part = part.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda tok: F.concat(tok, F.lit(f"_{r}")),
                        ),
                        " ",
                    ),
                )
            if t == "embeddings" and r > 0:
                # circular-shift each vector by r positions: preserves
                # norms and all WITHIN-replica pairwise dots exactly
                # (same geometry per replica) while decorrelating
                # replicas — verbatim copies would hand the near-dup
                # family Kx exact duplicates per vector, turning the
                # scale probe into a duplication stress test
                rot = r % 64
                if rot:
                    part = part.withColumn(
                        "embedding",
                        F.concat(
                            F.slice("embedding", rot + 1, 64 - rot),
                            F.slice("embedding", 1, rot),
                        ),
                    )
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only")
    ap.add_argument("--out")
    args = ap.parse_args()

    from proglog_spark import queries as q
    from proglog_spark.session import build_session
    from proglog_spark.sources.tables import TABLES, load_table

    spark = build_session(
        "scale-probe",
        master="local[32]",
        shuffle_partitions=64,
        # local mode = one JVM: at 10x the default driver heap is the
        # binding resource (executors and driver share it)
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = args.out or tempfile.mkdtemp(prefix=f"scale{args.k}x_")
    marker = os.path.join(out_dir, "_complete")
    if not os.path.exists(marker):
        replicate(spark, args.sf, out_dir, args.k)
        open(marker, "w").write("ok")
    names = list(DEFAULT_QUERIES)
    if args.only:
        names = [n for n in args.only.split(",") if n]

    for t in TABLES:
        load_table(spark, args.sf, t).count()
        load_table(spark, out_dir, t).count()

    fns = q.queries()
    results = {}
    for name in names:
        t0 = time.perf_counter()
        n1 = len(fns[name](spark, args.sf).collect())
        base_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        nk = len(fns[name](spark, out_dir).collect())
        big_s = time.perf_counter() - t0
        results[name] = {
            "base_s": round(base_s, 2),
            f"x{args.k}_s": round(big_s, 2),
            "ratio": round(big_s / base_s, 1) if base_s > 0 else None,
            "rows": [n1, nk],
        }
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"metric": f"scale_probe_x{args.k}", "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
