#!/usr/bin/env python3
"""Compare two graft bench_out.json artifacts row by row.

Usage: bench_compare.py BEFORE.json AFTER.json [--md]
Prints per-query min seconds (before, after, delta, ratio) sorted by
absolute win, plus totals — the round's before/after evidence table.
"""
import json
import sys


def main() -> None:
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    md = "--md" in sys.argv
    qb, qa = before["queries"], after["queries"]
    shared = sorted(set(qb) & set(qa), key=lambda k: qa[k] - qb[k])
    sb = sum(qb[k] for k in shared)
    sa = sum(qa[k] for k in shared)
    if md:
        print("| query | before s | after s | delta s | ratio |")
        print("|---|---|---|---|---|")
        fmt = "| {k} | {b:.2f} | {a:.2f} | {d:+.2f} | {r:.2f}x |"
    else:
        fmt = "{k:38s} {b:8.2f} {a:8.2f} {d:+8.2f} {r:6.2f}x"
    for k in shared:
        b, a = qb[k], qa[k]
        print(fmt.format(k=k, b=b, a=a, d=a - b, r=a / b if b else float("inf")))
    print()
    print(f"shared rows: {len(shared)}  before sum {sb:.1f}s  after sum {sa:.1f}s  "
          f"delta {sa - sb:+.1f}s ({(sa / sb - 1) * 100:+.1f}%)")
    print(f"totals: before {before['value']}s ({before['n_queries']} rows, "
          f"load_ok={before['load_ok']})  after {after['value']}s "
          f"({after['n_queries']} rows, load_ok={after['load_ok']})")


if __name__ == "__main__":
    main()
