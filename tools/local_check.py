#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
runs each oracle SQL in DuckDB over the sf tables and compares against the
parquet dumped by graft.Verify (sorted columns, sorted rows, exact values).

Usage: python3 tools/local_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        fails.append(name); print(f"FAIL {name}: no spark output"); continue
    try:
        sdf = pq.read_table(spark_path).to_pandas()
        ddf = con.execute(sql).df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: {e}"); continue
    # driver compare: sort columns by name, then hash values
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    ddf = ddf.reindex(sorted(ddf.columns), axis=1)
    if list(sdf.columns) != list(ddf.columns):
        fails.append(name)
        print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
        continue
    if len(sdf) != len(ddf):
        fails.append(name)
        print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
        continue
    s = sdf.astype(str).sort_values(list(sdf.columns)).reset_index(drop=True)
    d = ddf.astype(str).sort_values(list(ddf.columns)).reset_index(drop=True)
    if not s.equals(d):
        neq = (s != d).any(axis=1)
        fails.append(name)
        print(f"FAIL {name}: {int(neq.sum())}/{len(s)} differing rows; first:")
        idx = neq.idxmax()
        print("  spark:", s.loc[idx].to_dict())
        print("  duck :", d.loc[idx].to_dict())
    else:
        print(f"ok   {name} ({len(sdf)} rows)")

# queries without oracle → rows-only check
for p in glob.glob(f"{out_dir}/*/"):
    name = os.path.basename(p.rstrip("/"))
    if name not in oracle:
        n = pq.read_table(p).num_rows
        print(f"rows {name}: {n} rows (no oracle)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
