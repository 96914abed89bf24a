#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only; the Scala
library has no Python dependency). Run `sbt "runMain graft.Verify <sfdir> <out>"`
first, then this script: it executes each oracle_sql.json entry in DuckDB over
the same parquet tables and diffs against the Spark result parquet.
"""
import json, sys, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    spark_files = glob.glob(f"{d}/*.parquet")
    if not spark_files:
        results[name] = "NO_SPARK_OUTPUT"
        continue
    sdf = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracle:
        results[name] = f"ROWS_ONLY rows={len(sdf)}"
        continue
    try:
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR {e}"
        continue
    if sorted(sdf.columns) != sorted(odf.columns):
        results[name] = f"SCHEMA_MISMATCH spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        continue
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    if len(s) != len(o):
        results[name] = f"ROWCOUNT spark={len(s)} oracle={len(o)}"
        continue
    mismatch = None
    for c in cols:
        sv, ov = s[c], o[c]
        if str(sv.dtype) != str(ov.dtype):
            try:
                sv = sv.astype(ov.dtype)
            except Exception:
                mismatch = f"DTYPE {c} {sv.dtype} vs {ov.dtype}"
                break
        neq = sv.ne(ov) & ~(sv.isna() & ov.isna())
        if neq.any():
            i = neq.idxmax()
            mismatch = f"VALUE col={c} row={i} spark={s[c][i]!r} oracle={o[c][i]!r}"
            break
    results[name] = "OK" if mismatch is None else f"MISMATCH {mismatch}"

npass = sum(1 for v in results.values() if v == "OK")
nrows = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
for k, v in results.items():
    flag = "PASS" if v == "OK" else ("INFO" if v.startswith("ROWS_ONLY") else "FAIL")
    print(f"{flag:4} {k}: {v}")
print(f"\n{npass} exact-match PASS, {nrows} rows-only, "
      f"{len(results) - npass - nrows} FAIL of {len(results)}")
