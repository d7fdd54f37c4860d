#!/usr/bin/env python3
"""Bitwise parity check for the deterministic ln.

Usage: first `sbt "runMain graft.DetLnParityDump /tmp/detln_parity"`,
then `python3 scripts/check_detln.py /tmp/detln_parity`.

Evaluates the OracleSql.detLn-generated SQL (written alongside the
dump) in DuckDB over the same arguments and compares the raw bit
patterns against the JVM DetLn.ln values. Exit 0 only on zero
mismatches.
"""
import struct
import sys

import duckdb

base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/detln_parity"
sql = open(base + ".sql").read()
rows = duckdb.connect().execute(sql).fetchall()


def bits(d):
    return struct.unpack("<q", struct.pack("<d", d))[0]


mism = [(x, j, s) for x, j, s in rows if bits(j) != bits(s)]
print(f"{len(mism)} bitwise mismatches of {len(rows)}")
for x, j, s in mism[:10]:
    print(f"  x={x!r}: jvm={j.hex()} sql={s.hex()}")
sys.exit(1 if mism else 0)
