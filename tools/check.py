#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify output parquet,
run each oracle SQL in DuckDB over the same sf dir, compare schema + values
(columns sorted by name, rows sorted by all columns)."""
import json, sys, glob, os
import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
results = {}
# Expected = every declared query (queries.json, covers rows-only ones) plus
# every oracle key plus every produced dir: a query that crashed in Verify
# (caught + continued there) has no dir and must show as failing, not be
# silently skipped.
produced = {n for n in os.listdir(OUT) if os.path.isdir(os.path.join(OUT, n))}
declared = set()
qpath = os.path.join(OUT, "queries.json")
if os.path.exists(qpath):
    declared = set(json.load(open(qpath)))
for name in sorted(set(oracle) | produced | declared):
    d = os.path.join(OUT, name)
    if not os.path.isdir(d):
        results[name] = "MISSING OUTPUT: query crashed in Verify (no dir)"
        continue
    files = glob.glob(f"{d}/*.parquet")
    spark_df = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    if name not in oracle:
        results[name] = f"rows-only: {len(spark_df)} rows"
        continue
    try:
        oracle_df = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE ERROR: {e}"
        continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    o = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    if list(s.columns) != list(o.columns):
        results[name] = f"SCHEMA MISMATCH: spark={list(s.columns)} oracle={list(o.columns)}"
        continue
    if len(s) != len(o):
        results[name] = f"ROWCOUNT MISMATCH: spark={len(s)} oracle={len(o)}"
        continue
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(s, o, check_dtype=True, check_exact=True)
        results[name] = f"OK ({len(s)} rows)"
    except AssertionError as e:
        results[name] = "VALUE MISMATCH: " + str(e).split("\n")[0]
        # show first differing cells
        for c in s.columns:
            neq = (s[c] != o[c]) & ~(s[c].isna() & o[c].isna())
            if neq.any():
                i = neq.idxmax()
                results[name] += f" | col={c} row={i} spark={s[c][i]!r} oracle={o[c][i]!r}"
                break

fails = 0
for k, v in sorted(results.items()):
    flag = " " if v.startswith("OK") or v.startswith("rows-only") else "X"
    if flag == "X":
        fails += 1
    print(f"[{flag}] {k}: {v}")
print(f"\n{len(results)} queries, {fails} failing")
sys.exit(1 if fails else 0)
