#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [outDir] [sfDir]
Reads outDir/<name>/ (parquet written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle in DuckDB against the sf tables,
and compares (schema, rows, hashed values) like the driver does:
columns sorted by name, rows sorted, exact value compare.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"[MISS] {name}: no spark output"); fail += 1; continue
    try:
        sdf = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{spark_dir}/*.parquet")])
    except Exception as e:
        print(f"[MISS] {name}: unreadable spark output: {e}"); fail += 1; continue
    try:
        ddf = con.execute(sql).df()
    except Exception as e:
        print(f"[ORACLE-ERR] {name}: {e}"); fail += 1; continue
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    ddf = ddf.reindex(sorted(ddf.columns), axis=1)
    if list(sdf.columns) != list(ddf.columns):
        print(f"[SCHEMA] {name}: spark={list(sdf.columns)} duck={list(ddf.columns)}")
        fail += 1; continue
    if len(sdf) != len(ddf):
        print(f"[ROWS] {name}: spark={len(sdf)} duck={len(ddf)}"); fail += 1; continue
    key = list(sdf.columns)
    s = sdf.sort_values(key, na_position="last").reset_index(drop=True)
    d = ddf.sort_values(key, na_position="last").reset_index(drop=True)
    mismatch = None
    for c in key:
        sv, dv = s[c], d[c]
        try:
            eq = (sv == dv) | (sv.isna() & dv.isna())
        except Exception:
            eq = sv.astype(str) == dv.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            mismatch = (c, sv.iloc[i], dv.iloc[i])
            break
    if mismatch:
        c, a, b = mismatch
        print(f"[VALUE] {name}: col={c} spark={a!r} duck={b!r}")
        fail += 1
    else:
        print(f"[OK] {name} ({len(s)} rows)")
print(f"\n{len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
