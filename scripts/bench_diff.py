#!/usr/bin/env python3
"""Compare two Bench JSON artifacts per query.

Usage: python3 scripts/bench_diff.py OLD.json NEW.json [threshold]

Prints total deltas, the biggest regressions/improvements on shared
queries, and new/removed queries. Dev tooling only.
"""
import json
import sys


def main():
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    osum = sum(oq[k] for k in shared)
    nsum = sum(nq[k] for k in shared)
    print(f"old total {old.get('value')}s/{len(oq)}q load={old.get('load')} "
          f"new total {new.get('value')}s/{len(nq)}q load={new.get('load')}")
    print(f"shared {len(shared)}q: {osum:.1f}s -> {nsum:.1f}s "
          f"({(nsum - osum) / osum * 100:+.1f}%)")
    deltas = sorted(((nq[k] - oq[k], k) for k in shared), reverse=True)
    print("top regressions:")
    for d, k in deltas[:8]:
        if d < thr:
            break
        med = new.get("queries_median", {}).get(k)
        print(f"  {k}: {oq[k]:.2f} -> {nq[k]:.2f} (+{d:.2f})"
              + (f" median {med:.2f}" if med is not None else ""))
    print("top improvements:")
    for d, k in deltas[::-1][:8]:
        if d > -thr:
            break
        print(f"  {k}: {oq[k]:.2f} -> {nq[k]:.2f} ({d:.2f})")
    if set(nq) - set(oq):
        print("new:", {k: round(nq[k], 2) for k in sorted(set(nq) - set(oq))})
    if set(oq) - set(nq):
        print("removed:", sorted(set(oq) - set(nq)))


if __name__ == "__main__":
    main()
