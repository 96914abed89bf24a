#!/usr/bin/env python3
"""Dev tool: time the oracle-SQL side of each query in single-node DuckDB at a
given SF and compare with a graft Bench JSON. DuckDB runs the *arithmetic
equivalents* (it has no spatial extension here), so for geometry-heavy queries
DuckDB's side is strictly cheaper than real geometry work — the comparison is
a conservative lower bound for DuckDB's cost. Output: BENCH_NOTES.md table.
"""
import json, os, sys, time
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
bench_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_bench.json"
oracle_json = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_verify/oracle_sql.json"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(oracle_json))
bench = json.load(open(bench_json))["queries"]

rows = []
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        dt = time.time() - t0
    except Exception as e:
        dt = None
    g = bench.get(name)
    rows.append((name, dt, g))

print("| query | duckdb oracle-equivalent (s) | graft (s) | ratio graft/duckdb |")
print("|---|---|---|---|")
for name, dt, g in rows:
    if dt is None or g is None or g < 0:
        print(f"| {name} | n/a | {g} | — |")
    else:
        print(f"| {name} | {dt:.2f} | {g:.2f} | {g/dt:.1f}x |")
