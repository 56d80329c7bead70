#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, when an
``oracle_sql()`` twin exists, the same query on DuckDB over the same
parquet fixtures. Compares row count, column names, and an
order-insensitive multiset of stringified row values (columns sorted
by name — the driver's documented comparison shape).

Usage: python tools/check_oracle.py [--sf DIR] [--only name1,name2]
       [--cohort rN]

``--cohort rN`` re-oracles every name whose LATEST driver green is
round N (the ``_CHECKED_BY_ROUND`` group in queries.py) — the cheap
between-windows staleness insurance from VERDICT-r10 #5: the driver's
50-slot window revisits the 202-name surface only every ~4 rounds, so
the stalest cohort gets a local sf0.01 sweep at round open instead of
waiting its turn.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_value(r[i]) for i in order) for r in rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--cohort",
        default=None,
        metavar="rN",
        help="check every name whose latest driver green is round N "
        "(a _CHECKED_BY_ROUND group label, e.g. r6)",
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from proglog_spark.session import build_session

    if args.cohort:
        from proglog_spark import queries as qmod

        groups = dict(qmod._CHECKED_BY_ROUND)
        if args.cohort not in groups:
            sys.exit(
                f"unknown cohort {args.cohort!r}; have {sorted(groups)}"
            )
        cohort = ",".join(groups[args.cohort])
        args.only = (
            f"{args.only},{cohort}" if args.only else cohort
        )

    spark = build_session("check-oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            sdtypes = dict(sdf.dtypes)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            odtypes = {
                c: str(t) for c, t in zip(rel.columns, rel.types)
            }
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {str(e)[:200]}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            # the driver also compares SCHEMA — surface type drift
            # (Spark INT vs DuckDB BIGINT etc.) locally too. DuckDB
            # relation types are precise (the DB-API description is
            # not); arrays compare by element type.
            norm = {
                "BIGINT": "bigint", "VARCHAR": "string",
                "INTEGER": "int", "DOUBLE": "double", "FLOAT": "float",
                "BOOLEAN": "boolean", "DATE": "date",
            }

            def dnorm(t: str) -> str:
                if t.endswith("[]"):
                    return f"array<{dnorm(t[:-2])}>"
                return norm.get(t, t.lower())

            drift = {
                c: (sdtypes.get(c), odtypes[c])
                for c in ocols
                if dnorm(odtypes[c]) != sdtypes.get(c)
            }
            if drift:
                problems.append(f"dtypes {drift}")
        if not problems:
            sm, om = rows_multiset(scols, srows), rows_multiset(ocols, orows)
            if sm != om:
                diff_s = list((sm - om).items())[:3]
                diff_o = list((om - sm).items())[:3]
                problems.append(f"values spark-only={diff_s} oracle-only={diff_o}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
