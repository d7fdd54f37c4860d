#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Reads each <outDir>/<name> parquet produced by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
same source tables, and compares (columns sorted by name, rows sorted).
Dev tooling only — the library itself never depends on this.
"""
import json
import math
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return float(v)
    if hasattr(v, "tolist"):
        return tuple(v.tolist())
    if isinstance(v, list):
        return tuple(v)
    if isinstance(v, bytes):
        return v.hex()
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.execute(f"SELECT * FROM '{OUT_DIR}/{name}/*.parquet'")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
            exp_rel = con.execute(sql)
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            failures += 1
            continue
        gc, gr = canon(got, got_cols)
        ec, er = canon(exp, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            failures += 1
        elif len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            failures += 1
        elif gr != er:
            bad = sum(1 for a, b in zip(gr, er) if a != b)
            print(f"FAIL {name}: {bad}/{len(gr)} differing rows")
            for a, b in list(zip(gr, er))[:2000]:
                if a != b:
                    print(f"   got {a}\n   exp {b}")
                    break
            failures += 1
        else:
            print(f"OK   {name} ({len(gr)} rows)")
    # rows-only queries (no oracle): just report counts
    import glob, os
    for d in sorted(glob.glob(f"{OUT_DIR}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"ROWS {name} ({n} rows, no oracle)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
