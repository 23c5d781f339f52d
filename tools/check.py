#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]

For each query in outdir/oracle_sql.json: register the sfdir parquet tables
as DuckDB views, run the oracle SQL, load the Spark result parquet, sort
columns by name, and compare shape, dtypes, and values (exact; float columns
compared exactly too, since both sides round). Queries without oracle SQL
are reported rows-only.
"""
import glob, json, sys

import duckdb
import pandas as pd

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    # driver lakes are single files; builder-made lakes (MakeScaled /
    # MakeSkewed) are Spark output DIRECTORIES named <t>.parquet
    import os
    src = (f"{SFDIR}/{t}.parquet/*.parquet"
           if os.path.isdir(f"{SFDIR}/{t}.parquet") else f"{SFDIR}/{t}.parquet")
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
results = {}
for d in sorted(glob.glob(f"{OUT}/*/")):
    name = d.rstrip("/").split("/")[-1]
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))],
                        ignore_index=True)
    except Exception as e:
        results[name] = f"SPARK-READ-FAIL {e}"
        continue
    if name not in oracle:
        results[name] = ("EMPTY rows-only rows=0" if len(got) == 0
                         else f"rows-only rows={len(got)}")
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE-FAIL {str(e).splitlines()[0][:200]}"
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        results[name] = f"COLS got={list(got.columns)} exp={list(exp.columns)}"
        continue
    if got.shape != exp.shape:
        results[name] = f"SHAPE got={got.shape} exp={exp.shape}"
        continue
    bad = []
    for c in got.columns:
        a, b = got[c], exp[c]
        try:
            if a.dtype != b.dtype:
                # normalize common benign diffs for reporting, still flag
                bad.append(f"dtype[{c}] {a.dtype} vs {b.dtype}")
                a = a.astype(object); b = b.astype(object)
            eq = (a.isna() & b.isna()) | (a == b)
            if not eq.all():
                i = (~eq).idxmax()
                bad.append(f"val[{c}]@{i}: {a[i]!r} vs {b[i]!r} ({int((~eq).sum())} diffs)")
        except Exception as e:
            bad.append(f"cmp[{c}] {e}")
    results[name] = "OK" if not bad else "DIFF " + "; ".join(bad[:4])

npass = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only rows=")
            and "EMPTY" not in v)
for k in sorted(results):
    flag = ("PASS" if results[k] == "OK"
            else "ROWS" if results[k].startswith("rows-only")
            else "FAIL")
    print(f"{flag:4} {k:24} {results[k]}")
print(f"\n{npass}/{len(results)} ok")
