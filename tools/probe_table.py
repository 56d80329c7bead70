#!/usr/bin/env python
"""Render a scale_probe JSON log as the SCALING.md markdown table.

Usage: python tools/probe_table.py /tmp/scale_probe_full.log [--top N]
Reads the per-query JSON lines scale_probe.py prints, sorts by ratio
descending, and emits a markdown table (all rows, or --top N plus a
summary line for the rest).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--top", type=int, default=0)
    args = ap.parse_args()

    rows = {}
    for line in open(args.log):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "metric" in d:
            continue
        for name, r in d.items():
            rows[name] = r

    xk = next(k for k in next(iter(rows.values())) if k.startswith("x"))
    ordered = sorted(rows.items(), key=lambda kv: -(kv[1]["ratio"] or 0))
    print(f"| query | 1x s | {xk[1:]} s | ratio |")
    print("|---|---|---|---|")
    shown = ordered if not args.top else ordered[: args.top]
    for name, r in shown:
        print(f"| {name} | {r['base_s']} | {r[xk]} | {r['ratio']} |")
    if args.top and len(ordered) > args.top:
        import statistics

        rest = [(r["ratio"] or 0) for _, r in ordered[args.top :]]
        print(
            f"\n(+{len(rest)} more queries, ratio median "
            f"{statistics.median(rest)}, max {max(rest)})"
        )


if __name__ == "__main__":
    main()
