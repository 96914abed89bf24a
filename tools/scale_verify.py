#!/usr/bin/env python3
"""Scale-point correctness compare (dev tool, sf1 and up): same contract as
tools/local_verify.py but the diff runs entirely inside DuckDB — a multiset
EXCEPT ALL in both directions — so 6M-row per-query results compare in
seconds instead of dragging them through pandas. Columns are aligned to the
oracle's types on both sides (the driver gate does the same dtype
normalization), then compared as VARCHAR so NULL-safe multiset semantics
apply uniformly.

Usage: python3 tools/scale_verify.py <sfdir> <verify-outdir>
<sfdir> tables may be single parquet files (driver fixtures) or
directories of part files (GenScale output).
"""
import json, sys, os
import duckdb

sfdir = sys.argv[1]
outdir = sys.argv[2]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# n_pass = bidirectional EXCEPT ALL exact-multiset matches; n_cksum = the
# weaker order-independent 64-bit content-checksum tier used above the row
# threshold. Reported separately so artifacts state the verification grade
# accurately instead of folding both into one "exact" count.
n_pass = n_cksum = n_fail = n_rows_only = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    import glob as _g
    if not _g.glob(f"{d}/*.parquet"):
        print(f"FAIL {name}: NO_SPARK_OUTPUT")
        n_fail += 1
        continue
    con.execute("DROP VIEW IF EXISTS _s")
    con.execute(f"CREATE VIEW _s AS SELECT * FROM '{d}/*.parquet'")
    nrows = con.execute("SELECT count(*) FROM _s").fetchone()[0]
    if name not in oracle:
        print(f"ROWS_ONLY {name}: rows={nrows}")
        n_rows_only += 1
        continue
    con.execute("DROP VIEW IF EXISTS _o")
    try:
        con.execute(f"CREATE VIEW _o AS {oracle[name]}")
        otypes = {r[0]: r[1] for r in con.execute("DESCRIBE _o").fetchall()}
    except Exception as e:
        print(f"FAIL {name}: ORACLE_SQL_ERROR {e}")
        n_fail += 1
        continue
    stypes = {r[0]: r[1] for r in con.execute("DESCRIBE _s").fetchall()}
    if sorted(stypes) != sorted(otypes):
        print(f"FAIL {name}: SCHEMA spark={sorted(stypes)} oracle={sorted(otypes)}")
        n_fail += 1
        continue
    cols = sorted(otypes)
    # align both sides to the oracle's type, then VARCHAR for the multiset op
    sel = ", ".join(
        f'CAST(CAST("{c}" AS {otypes[c]}) AS VARCHAR) AS "{c}"' for c in cols)
    # EXCEPT ALL hashes both full result sets — fine to ~100M rows, but a
    # 600M-row per-row kernel output would need more spill disk than this
    # host has. Above the threshold switch to an order-independent content
    # checksum: count(*) + sum(hash(row)::HUGEINT) over the same
    # type-aligned projection on both sides. Equality is a multiset match
    # up to 64-bit-hash collisions summed in 128 bits — streaming, O(1)
    # memory, and still covers EVERY row's full content.
    cksum_rows = int(os.environ.get("SCALE_VERIFY_CHECKSUM_ROWS", "150000000"))
    hash_args = ", ".join(f'CAST(CAST("{c}" AS {otypes[c]}) AS VARCHAR)'
                          for c in cols)
    try:
        onrows = con.execute("SELECT count(*) FROM _o").fetchone()[0]
        if nrows != onrows:
            print(f"FAIL {name}: ROWCOUNT spark={nrows} oracle={onrows}")
            n_fail += 1
            continue
        if nrows > cksum_rows:
            s_ck = con.execute(
                f"SELECT sum(hash({hash_args})::HUGEINT) FROM _s").fetchone()[0]
            o_ck = con.execute(
                f"SELECT sum(hash({hash_args})::HUGEINT) FROM _o").fetchone()[0]
            if s_ck == o_ck:
                print(f"PASS {name}: CHECKSUM rows={nrows}")
                n_cksum += 1
            else:
                print(f"FAIL {name}: CHECKSUM_DIFF spark={s_ck} oracle={o_ck}")
                n_fail += 1
            continue
        ndiff = con.execute(
            f"SELECT count(*) FROM ("
            f"(SELECT {sel} FROM _s EXCEPT ALL SELECT {sel} FROM _o) "
            f"UNION ALL "
            f"(SELECT {sel} FROM _o EXCEPT ALL SELECT {sel} FROM _s))"
        ).fetchone()[0]
    except Exception as e:
        print(f"FAIL {name}: COMPARE_ERROR {e}")
        n_fail += 1
        continue
    if ndiff == 0:
        print(f"PASS {name}: OK rows={nrows}")
        n_pass += 1
    else:
        ex = con.execute(
            f"SELECT * FROM (SELECT {sel} FROM _s EXCEPT ALL SELECT {sel} FROM _o) LIMIT 1"
        ).fetchall()
        print(f"FAIL {name}: MULTISET_DIFF rows_differing={ndiff} spark_example={ex}")
        n_fail += 1

meta = {}
try:
    meta = json.load(open(f"{outdir}/run_meta.json"))
except Exception:
    pass
print(f"\n{n_pass} exact-match PASS, {n_cksum} checksum PASS, "
      f"{n_rows_only} rows-only, {n_fail} FAIL "
      f"of {n_pass + n_cksum + n_rows_only + n_fail} "
      f"(commit={meta.get('commit', 'unknown')}, sf={sfdir})")
sys.exit(1 if n_fail else 0)
