#!/usr/bin/env python3
"""Gate ONE query in an isolated process (sf1-sweep hardening: a
quadratic oracle's memory use dies with the process instead of
poisoning the next query's allocator).

Usage: python3 tools/check_one.py <name> [outDir] [sfDir]
Prints one line: [OK]/[SCHEMA]/[ROWS]/[VALUE]/[ORACLE-ERR]/[MISS] like
tools/check.py, and exits 0 only on [OK].
"""
import sys, json, glob, os, math
import duckdb
import pandas as pd

name = sys.argv[1]
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

con = duckdb.connect()
con.execute(f"SET memory_limit='{os.environ.get('GATE_MEM', '80GB')}'")
# GATE_THREADS caps DuckDB's parallelism: ordered aggregates hold
# per-thread sort state that does not spill, so a 32-thread run of an
# element-join oracle (q52's in-SQL Lloyd) can exhaust the limit where
# a 4-thread run fits comfortably — peak memory scales with threads on
# exactly the oracles this script isolates.
if os.environ.get("GATE_THREADS"):
    con.execute(f"SET threads={int(os.environ['GATE_THREADS'])}")
# per-process spill dir: concurrent gates must not clobber each other's
# temp files (duckdb names them per-connection, not per-process)
con.execute(f"SET temp_directory='/tmp/duckdb_spill/{os.getpid()}'")
for p in glob.glob(f"{sf}/*.parquet"):
    t = os.path.basename(p).removesuffix(".parquet")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

sql = json.load(open(f"{out}/oracle_sql.json"))[name]

# The components oracles' one-shot recursive-CTE closure is quadratic in
# component size and OOMs beyond sf0.1. For the large-sf sweep, replay
# the SAME semantics as iterative temp-table min-label propagation
# (materialize one bounded label relation per round, O(E) a round,
# diameter rounds) — the single-SQL form in oracle_sql.json stays the
# driver's sf0.01 gate, so the closed-form fixpoint is still cross-proven
# there; this path only re-proves it at scales the CTE cannot reach.
PAIR_MARKER = "), e AS (SELECT doc_a AS u, doc_b AS v FROM p UNION SELECT doc_b, doc_a FROM p)"
ITERATIVE = {"q85_dup_components", "q104_components_keep_by",
             "q231_leak_free_split"}

# The five pairwise-verify oracles build a per-candidate-pair element
# join (candidate x ~300 grams, or x 64 vector dims) whose single-shot
# intermediate exceeds memory+spill at sf1 (observed: 16.9M candidate
# pairs x ~300 grams = ~5e9 rows for q43). Same q85/q104 precedent:
# replay the IDENTICAL SQL text with the pair-stage CTE evaluated in
# hash-partitioned chunks of its upstream relation — every CTE body is
# executed verbatim (materialized as a temp table in declaration
# order); the chunked CTE's GROUP BY / DISTINCT key starts with the
# chunk column, so per-chunk evaluation partitions its output exactly
# and the union equals the one-shot result row-for-row. The single-SQL
# form in oracle_sql.json stays the driver's sf0.01 gate, so the
# closed form is still cross-proven there; this path only re-proves it
# at scales the one-shot plan cannot reach.
# name -> [(cte_to_chunk, upstream_relation, chunk_column, n_chunks)]
CHUNKED = {
    "q43_ngram_jaccard": [("inter", "cand", "doc_a", 64)],
    "q112_containment": [("cand", "pfx", "doc_id", 64),
                         ("inter", "cand", "doc_a", 64)],
    "q154_minhash_accuracy": [("pb", "cand", "doc_a", 16),
                              ("inter0", "ag", "doc_a", 64)],
    "q44_embed_neardup": [("cand", "pr", "vec_id", 16),
                          ("d", "cand", "vec_a", 64)],
    # p is a self-join of asg (both sides) — chunking its upstream would
    # drop cross-chunk pairs; p itself is cell-bounded, so materialize
    # it whole and chunk only the element-join stage d
    "q111_semdedup": [("d", "p", "va", 64)],
    # sf is the FULL-corpus final assignment (el x 64 trained cents by
    # dim = 80M+ joined rows into per-(vec, cent) ordered aggregates —
    # ordered-agg state does not spill); sf groups by el.vec_id first,
    # so vec_id-chunking el partitions its output exactly. The earlier
    # Lloyd stages (s1/s2) run on the 512-row training sample and stay
    # one-shot.
    "q52_ann_ivf": [("sf", "el", "vec_id", 16)],
}


def split_ctes(sql):
    """Top-level CTE list of a 'WITH a AS (...), b AS (...) SELECT ...'
    statement -> ([(name, body)], final_select). Paren matching skips
    single-quoted strings (the '' escape included)."""
    assert sql[:5].upper() == "WITH ", "not a WITH statement"
    i, ctes = 5, []
    while True:
        while sql[i].isspace():
            i += 1
        j = i
        while not sql[j].isspace():
            j += 1
        name = sql[i:j]
        k = sql.index("(", j)  # the body paren (skips AS / MATERIALIZED)
        depth, m, in_str = 0, k, False
        while True:
            c = sql[m]
            if in_str:
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            m += 1
        ctes.append((name, sql[k + 1:m]))
        p = m + 1
        while sql[p].isspace():
            p += 1
        if sql[p] == ",":
            i = p + 1
        else:
            return ctes, sql[p:]


# Executed with `python3 -c` per step: DuckDB's ordered aggregates
# (SUM(x ORDER BY i)) retain buffer-pool memory across statements AND
# across reconnects (the Python module caches the database instance per
# path), so a 64-chunk loop in one process marches to the memory limit
# and dies around chunk 4-14 regardless of GC. Process isolation is the
# only clean allocator boundary; the file-backed DB carries state.
CHUNK_WORKER = """
import duckdb, json, sys
spec = json.load(open(sys.argv[1]))
c = duckdb.connect(spec["db"])
c.execute("SET memory_limit='%s'" % spec["mem"])
c.execute("SET threads=%s" % spec["threads"])
c.execute("SET temp_directory='%s'" % spec["tmp"])
for s in spec["stmts"]:
    c.execute(s)
c.execute("CHECKPOINT")
c.close()
"""


def run_chunked(sql, plan, sf_dir):
    """Replay the oracle SQL with the pair-stage CTEs evaluated in
    hash-partitioned chunks of their upstream relation, ONE SUBPROCESS
    per chunk (see CHUNK_WORKER). Every CTE body runs verbatim; the
    chunked CTE's GROUP BY / DISTINCT key starts with the chunk column,
    so the per-chunk union equals the one-shot result row-for-row."""
    import subprocess, tempfile
    mem = os.environ.get("GATE_MEM", "80GB")
    threads = os.environ.get("GATE_THREADS", "8")
    tmpdir = f"/tmp/duckdb_spill/{os.getpid()}"
    dbpath = f"/tmp/duckdb_spill/chunked_{os.getpid()}.db"
    result = f"/tmp/duckdb_spill/chunked_{os.getpid()}_result.parquet"
    for f in (dbpath, dbpath + ".wal", result):
        if os.path.exists(f):
            os.remove(f)

    def run_step(stmts):
        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as f:
            json.dump({"db": dbpath, "stmts": stmts, "mem": mem,
                       "threads": threads, "tmp": tmpdir}, f)
            spec = f.name
        try:
            r = subprocess.run([sys.executable, "-c", CHUNK_WORKER, spec],
                               capture_output=True, text=True)
            if r.returncode != 0:
                raise RuntimeError(
                    f"chunk step failed (rc={r.returncode}): "
                    f"{(r.stderr or r.stdout)[-800:]}")
        finally:
            os.unlink(spec)

    ctes, final = split_ctes(sql)
    steps = {cte: (up, col, n) for cte, up, col, n in plan}
    batch = [f"CREATE VIEW {os.path.basename(p).removesuffix('.parquet')} "
             f"AS SELECT * FROM read_parquet('{p}')"
             for p in glob.glob(f"{sf_dir}/*.parquet")]
    for cte_name, body in ctes:
        if cte_name in steps:
            up, col, n = steps[cte_name]
            # empty accumulator with the body's exact schema: evaluate
            # the body once over a WHERE FALSE view of the upstream
            batch += [
                f"ALTER TABLE {up} RENAME TO {up}__all",
                f"CREATE VIEW {up} AS SELECT * FROM {up}__all WHERE FALSE",
                f"CREATE TABLE {cte_name} AS {body}",
                f"DROP VIEW {up}"]
            run_step(batch)
            for i in range(n):
                # the chunk is MATERIALIZED (not a filtered view) so the
                # optimizer sees its true cardinality — a stats-less
                # view can flip the join order into the element-squared
                # cross product
                run_step([
                    f"CREATE OR REPLACE TABLE {up} AS SELECT * FROM "
                    f"{up}__all WHERE hash({col}) % {n} = {i}",
                    f"INSERT INTO {cte_name} {body}"])
            batch = [f"DROP TABLE {up}",
                     f"ALTER TABLE {up}__all RENAME TO {up}"]
        else:
            batch.append(f"CREATE TABLE {cte_name} AS {body}")
    batch.append(f"COPY ({final}) TO '{result}' (FORMAT PARQUET)")
    run_step(batch)
    df = pd.read_parquet(result)
    for f in (dbpath, dbpath + ".wal", result):
        if os.path.exists(f):
            os.remove(f)
    return df

def run_components_iteratively(con, sql, name):
    head = "WITH RECURSIVE p AS ("
    assert sql.startswith(head) and PAIR_MARKER in sql, "oracle shape changed"
    pairs_sql = sql[len(head):sql.index(PAIR_MARKER)]
    con.execute(f"CREATE TEMP TABLE e AS WITH p AS ({pairs_sql}) "
                "SELECT doc_a AS u, doc_b AS v FROM p "
                "UNION SELECT doc_b, doc_a FROM p")
    con.execute("CREATE TEMP TABLE lab AS SELECT doc_id AS node, doc_id AS lab FROM documents")
    while True:
        con.execute(
            "CREATE TEMP TABLE nl AS SELECT node, MIN(lab) AS lab FROM ("
            "SELECT node, lab FROM lab "
            "UNION ALL SELECT e.v AS node, l.lab FROM lab l JOIN e ON e.u = l.node"
            ") GROUP BY node")
        changed = con.execute(
            "SELECT COUNT(*) FROM nl JOIN lab USING (node) "
            "WHERE nl.lab <> lab.lab").fetchone()[0]
        con.execute("DROP TABLE lab")
        con.execute("ALTER TABLE nl RENAME TO lab")
        if changed == 0:
            break
    if name == "q85_dup_components":
        return con.execute(
            "SELECT node AS doc_id, lab AS component, node = lab AS keep FROM lab").df()
    if name == "q231_leak_free_split":
        # the gated config's tail: fracVal=0.1, fracTest=0.1, salt lfs1
        # (thresholds = floor(rate * 2.0^60) in DOUBLE arithmetic — the
        # exact Sampling.threshold image; integer // differs by ulps)
        t_val = math.floor(0.1 * float(2 ** 60))
        t_test = math.floor(0.2 * float(2 ** 60))
        return con.execute(
            "SELECT node AS doc_id, lab AS component, "
            f"CASE WHEN h < {t_val} THEN 'val' "
            f"WHEN h < {t_test} THEN 'test' ELSE 'train' END AS split "
            "FROM (SELECT node, lab, ('0x' || substr(md5("
            "CAST(lab AS VARCHAR) || ':component:lfs1'), 1, 15))::BIGINT AS h "
            "FROM lab) __l").df()
    return con.execute(
        "WITH s AS (SELECT node AS doc_id, lab AS component, "
        "CAST(d.n_chars AS BIGINT) AS score FROM lab JOIN documents d ON d.doc_id = lab.node), "
        "b AS (SELECT component, doc_id AS best_id FROM s "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY component ORDER BY score DESC, doc_id) = 1) "
        "SELECT s.doc_id, s.component, s.score, s.doc_id = b.best_id AS keep "
        "FROM s JOIN b USING (component)").df()

spark_dir = f"{out}/{name}"
if not os.path.isdir(spark_dir):
    print(f"[MISS] {name}: no spark output"); sys.exit(1)
try:
    sdf = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{spark_dir}/*.parquet")])
except Exception as e:
    print(f"[MISS] {name}: unreadable spark output: {e}"); sys.exit(1)
try:
    if name in ITERATIVE:
        ddf = run_components_iteratively(con, sql, name)
    elif name in CHUNKED:
        ddf = run_chunked(sql, CHUNKED[name], sf)
    else:
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
