#!/usr/bin/env python
"""Per-query optimization profiler (r11).

Times one or more declared queries in isolation with the bench's
session + warmup shape, optionally repeating with the session cache
cleared (cold) or warm (ride), and writes the
``.explain("formatted")`` output to plans/r11/<query>_<tag>.txt.

Usage:
  python tools/profile_query.py --queries name1,name2 [--tag before]
      [--reps 2] [--cold] [--sf /root/testdata/sf0.1] [--no-plan]

Unlike bench.py this never touches bench_queries.json — it is a
scratch instrument for the optimization rounds.
"""

from __future__ import annotations

import argparse

import pandas as pd
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from proglog_spark import queries as q  # noqa: E402
from proglog_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--tag", default=None, help="write plans/<round>/<q>_<tag>.txt")
    ap.add_argument("--round", default="r12", help="plans/<round>/ target dir")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cold", action="store_true",
                    help="clearCache() before every rep")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="profile-query",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # bench-equivalent warmup (JVM, IO cache, Python workers, codecs)
    from pyspark.sql import functions as F

    from proglog_spark.sources.tables import TABLES, load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in TABLES:
        load_table(spark, args.sf, t).count()

    @F.pandas_udf("long")
    def _noop(s: pd.Series) -> pd.Series:
        return s

    spark.range(10_000).repartition(int(cpus)).select(_noop("id")).collect()
    spark.sql(
        "SELECT from_json(to_json(named_struct('a', id)), 'a BIGINT'), "
        "unbase64(base64(CAST('x' AS BINARY))) FROM range(1)"
    ).collect()

    names = args.queries.split(",")
    fns = q.queries()
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.round,
    )
    for name in names:
        if name not in fns:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        for rep in range(args.reps):
            if args.cold:
                spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"profile:{name}:rep{rep}")
            t0 = time.perf_counter()
            rows = fns[name](spark, args.sf).collect()
            dt = time.perf_counter() - t0
            print(f"{name} rep{rep} {'cold' if args.cold else 'warm'}: "
                  f"{dt:.3f}s rows={len(rows)}")
        if args.tag and not name.endswith("_streamed"):
            os.makedirs(plans_dir, exist_ok=True)
            df = fns[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
            print(f"  plan -> plans/{args.round}/{name}_{args.tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
