#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load Verify output
parquet + run oracle_sql.json in DuckDB on the same tables, compare
(sorted rows, columns sorted by name). Not part of the library."""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
for name, sql in sorted(oracles.items()):
    if only and name not in only: continue
    pq = f"{out_dir}/{name}"
    if not os.path.isdir(pq):
        results[name] = "MISSING_SPARK_OUT"; continue
    try:
        mine = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
        oracle = con.sql(sql).df()
    except Exception as e:
        results[name] = f"ERROR {e}"; continue
    mine = mine.reindex(sorted(mine.columns), axis=1)
    oracle = oracle.reindex(sorted(oracle.columns), axis=1)
    if list(mine.columns) != list(oracle.columns):
        results[name] = f"SCHEMA cols mine={list(mine.columns)} oracle={list(oracle.columns)}"
        continue
    if len(mine) != len(oracle):
        results[name] = f"ROWS mine={len(mine)} oracle={len(oracle)}"; continue
    ms = mine.sort_values(by=list(mine.columns), na_position="first").reset_index(drop=True)
    os_ = oracle.sort_values(by=list(oracle.columns), na_position="first").reset_index(drop=True)
    bad = []
    for c in mine.columns:
        a, b = ms[c], os_[c]
        if a.dtype != b.dtype:
            bad.append(f"dtype[{c}] {a.dtype}!={b.dtype}")
        eq = (a == b) | (a.isna() & b.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            bad.append(f"val[{c}]@{i}: {a[i]!r} != {b[i]!r}")
    results[name] = "PASS" if not bad else "HASH " + "; ".join(bad[:4])

for k, v in sorted(results.items()):
    print(f"{'OK ' if v=='PASS' else 'FAIL'} {k}: {v}")
npass = sum(1 for v in results.values() if v == "PASS")
print(f"== {npass}/{len(results)} pass")
