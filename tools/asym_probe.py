#!/usr/bin/env python
"""Asymmetric-index scale probe (VERDICT-r6 #8): grow the PERSISTED
fingerprint INDEX by K× while the incoming drop stays 1×, and time the
steady-state incremental-dedup phase — drop hash + two-sided
`hamming_pairs` blocking against the loaded index. This measures the
contract `dedup.hamming_pairs(other=)` sells (and SCALING §17's
whole-fixture rows can't isolate): per-drop cost proportional to the
DROP, with the index contributing only one narrow scan (3 longs/row +
block explode), never an index×index self-join.

The index replica suffixes document tokens per replica (same recipe as
scale_probe.py) so the K× store is a bigger corpus, not K copies; the
drop is always the 1× odd doc_ids. Expected: wall grows FAR below K
(the index side is a linear scan of 3-long rows feeding a narrow
explode; candidates grow only with true cross-side near-dups).

Usage: python tools/asym_probe.py [--k 100] [--sf /root/testdata/sf0.01]
Prints one JSON line {k, index_rows, drop_rows, wall_1x, wall_kx,
ratio, pairs_1x, pairs_kx}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from proglog_spark.operators import dedup
    from proglog_spark.queries import _image_sketch
    from proglog_spark.session import build_session
    from proglog_spark.sources.tables import load_table

    spark = build_session("asym-probe", master="local[32]", shuffle_partitions=32)
    d = load_table(spark, args.sf, "documents")
    span = int(d.agg(F.max("doc_id")).collect()[0][0]) + 1

    # K× index corpus: evens of each replica, tokens suffixed per
    # replica (new vocabulary -> new pixels -> new hashes; K exact
    # copies would be a duplication stress test, not a scale test)
    evens = d.where(F.col("doc_id") % 2 == 0)
    parts = []
    for r in range(args.k):
        part = evens.withColumn("doc_id", F.col("doc_id") + 2 * r * span)
        if r > 0:
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
        parts.append(part)
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)

    scratch = tempfile.mkdtemp(prefix="asym_probe_")
    try:
        # both indexes PERSISTED once (write cost is the ingest-time
        # amortized cost, not the steady-state per-drop cost)
        idx1_path = os.path.join(scratch, "idx1")
        idxk_path = os.path.join(scratch, "idxk")
        _image_sketch(evens).write.parquet(idx1_path)
        _image_sketch(big).write.parquet(idxk_path)

        drop = d.where(F.col("doc_id") % 2 == 1)

        def steady_state(idx_path: str) -> tuple[float, int, int]:
            index = spark.read.parquet(idx_path)
            t0 = time.monotonic()
            pairs = dedup.hamming_pairs(
                _image_sketch(drop), max_hamming=3, blocks=4, other=index
            )
            n = pairs.count()
            wall = time.monotonic() - t0
            return wall, n, index.count()

        # warm once (JVM/codegen) then measure
        steady_state(idx1_path)
        w1, p1, n1 = steady_state(idx1_path)
        wk, pk, nk = steady_state(idxk_path)
        print(
            json.dumps(
                {
                    "k": args.k,
                    "index_rows_1x": n1,
                    "index_rows_kx": nk,
                    "drop_rows": drop.count(),
                    "wall_1x": round(w1, 2),
                    "wall_kx": round(wk, 2),
                    "ratio": round(wk / w1, 2),
                    "pairs_1x": p1,
                    "pairs_kx": pk,
                }
            )
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
