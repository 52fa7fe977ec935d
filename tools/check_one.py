#!/usr/bin/env python3
"""Gate ONE query in an isolated process (sf1-sweep hardening: a
quadratic oracle's memory use dies with the process instead of
poisoning the next query's allocator).

Usage: python3 tools/check_one.py <name> [outDir] [sfDir]
Prints one line: [OK]/[SCHEMA]/[ROWS]/[VALUE]/[ORACLE-ERR]/[MISS] like
tools/check.py, and exits 0 only on [OK].
"""
import sys, json, glob, os
import duckdb
import pandas as pd

name = sys.argv[1]
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

con = duckdb.connect()
con.execute(f"SET memory_limit='{os.environ.get('GATE_MEM', '80GB')}'")
# per-process spill dir: concurrent gates must not clobber each other's
# temp files (duckdb names them per-connection, not per-process)
con.execute(f"SET temp_directory='/tmp/duckdb_spill/{os.getpid()}'")
for p in glob.glob(f"{sf}/*.parquet"):
    t = os.path.basename(p).removesuffix(".parquet")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

sql = json.load(open(f"{out}/oracle_sql.json"))[name]
spark_dir = f"{out}/{name}"
if not os.path.isdir(spark_dir):
    print(f"[MISS] {name}: no spark output"); sys.exit(1)
try:
    sdf = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{spark_dir}/*.parquet")])
except Exception as e:
    print(f"[MISS] {name}: unreadable spark output: {e}"); sys.exit(1)
try:
    ddf = con.execute(sql).df()
except Exception as e:
    print(f"[ORACLE-ERR] {name}: {e}"); sys.exit(1)
sdf = sdf.reindex(sorted(sdf.columns), axis=1)
ddf = ddf.reindex(sorted(ddf.columns), axis=1)
if list(sdf.columns) != list(ddf.columns):
    print(f"[SCHEMA] {name}: spark={list(sdf.columns)} duck={list(ddf.columns)}")
    sys.exit(1)
if len(sdf) != len(ddf):
    print(f"[ROWS] {name}: spark={len(sdf)} duck={len(ddf)}"); sys.exit(1)
key = list(sdf.columns)
s = sdf.sort_values(key, na_position="last").reset_index(drop=True)
d = ddf.sort_values(key, na_position="last").reset_index(drop=True)
for c in key:
    sv, dv = s[c], d[c]
    try:
        eq = (sv == dv) | (sv.isna() & dv.isna())
    except Exception:
        eq = sv.astype(str) == dv.astype(str)
    if not eq.all():
        i = int((~eq).idxmax())
        print(f"[VALUE] {name}: col={c} spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}")
        sys.exit(1)
print(f"[OK] {name} ({len(sdf)} rows)")
