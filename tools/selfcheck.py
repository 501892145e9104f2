#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify output vs
DuckDB oracle on the same parquet tables. Usage:
  python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out
(Uses the driver-side duckdb/pyarrow installs; NOT part of the engine.)
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    spark_path = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(spark_path, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
    try:
        sdf = canon(pq.read_table(spark_path).to_pandas())
        ddf = canon(con.execute(sql).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {e}");  n_fail += 1;  continue
    if list(sdf.columns) != list(ddf.columns):
        print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
        n_fail += 1;  continue
    if len(sdf) != len(ddf):
        print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
        n_fail += 1;  continue
    # exact value compare (mirrors driver hash compare)
    try:
        eq = sdf.astype(str).equals(ddf.astype(str))
    except Exception:
        eq = False
    if eq:
        print(f"PASS {name} ({len(sdf)} rows)");  n_pass += 1
    else:
        diff = (sdf.astype(str) != ddf.astype(str))
        bad = diff.any(axis=1)
        print(f"FAIL {name}: value mismatch in {int(bad.sum())}/{len(sdf)} rows")
        with pd.option_context("display.width", 200):
            print("  spark:", sdf[bad].head(3).to_dict("records"))
            print("  duck :", ddf[bad].head(3).to_dict("records"))
        n_fail += 1

print(f"\n{n_pass} pass / {n_fail} fail")
sys.exit(1 if n_fail else 0)
