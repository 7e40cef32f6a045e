#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: compare Verify.scala
parquet dumps against DuckDB oracle SQL over the same sf tables."""
import duckdb, glob, json, sys, os
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    # every supported table set (driver fixtures, SfScaleGen output) is a
    # single plain file; the dir branch is defensive, for hand-pointed
    # Spark part-file directories only
    p = f"{sf_dir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        results[name] = "NO_OUTPUT"
        continue
    spark_df = con.execute(f"SELECT * FROM '{path}/*.parquet'").df()
    if name not in oracle:
        results[name] = f"rows_only({len(spark_df)})"
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype.kind in "iu":
                df[c] = df[c].astype("int64")
            elif df[c].dtype.kind == "f":
                df[c] = df[c].round(9)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    elif len(a) != len(b):
        results[name] = f"ROWCOUNT_MISMATCH spark={len(a)} duck={len(b)}"
    elif not a.equals(b):
        diff = (a != b).any(axis=1)
        results[name] = f"VALUE_MISMATCH ({diff.sum()} rows) e.g.\nspark:\n{a[diff].head(3)}\nduck:\n{b[diff].head(3)}"
    else:
        results[name] = f"MATCH ({len(a)} rows)"

ok = sum(1 for v in results.values() if v.startswith("MATCH") or v.startswith("rows_only"))
for k, v in results.items():
    print(f"{'PASS' if v.startswith(('MATCH','rows_only')) else 'FAIL':4} {k}: {v}")
print(f"\n{ok}/{len(results)} pass")
