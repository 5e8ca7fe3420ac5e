#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Reads the Verify output dir (one parquet dir per query + oracle_sql.json),
replays each oracle in DuckDB against the sf tables, and compares:
column sets (sorted by name), row counts, and value hashes row-by-row.
"""
import glob
import json
import math
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return out

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
    want = con.sql(sql)
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} != {wc}")
        fails += 1
        continue
    g = canon(got.fetchall(), got.columns)
    w = canon(want.fetchall(), want.columns)
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} != {len(w)}")
        fails += 1
        continue
    if g != w:
        diff = [(a, b) for a, b in zip(g, w) if a != b]
        print(f"FAIL {name}: {len(diff)}/{len(g)} rows differ; first: {diff[0]}")
        fails += 1
        continue
    print(f"OK   {name}: {len(g)} rows")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
