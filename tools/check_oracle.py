#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (dev tool only; the
engine itself is pure Scala/Spark). Reads Verify output parquet per query,
runs the declared oracle SQL in DuckDB over views on the same testdata,
sorts columns by name + rows by value, and compares hashes cell-by-cell.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

# Verify's per-query failure record (always written; {} when clean). A
# query listed here has no dump dir — report it as an execution failure
# up front instead of the generic read_parquet ERROR.
try:
    verify_errors = json.load(open(f"{out_dir}/errors.json"))
except FileNotFoundError:
    verify_errors = {}

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def cell(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if pd.isna(v):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)

fails = 0
for name in sorted(oracle):
    qdir = f"{out_dir}/{name}"
    if name in verify_errors:
        print(f"FAIL {name}: query errored in Verify ({verify_errors[name]})")
        fails += 1
        continue
    try:
        spark_df = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
        duck_df = con.execute(oracle[name]).df()
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            fails += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            fails += 1
            continue
        mismatch = None
        for col in s.columns:
            sv = [cell(v) for v in s[col]]
            dv = [cell(v) for v in d[col]]
            if sv != dv:
                for i, (a, b) in enumerate(zip(sv, dv)):
                    if a != b:
                        mismatch = (col, i, a, b)
                        break
                break
        if mismatch:
            col, i, a, b = mismatch
            print(f"FAIL {name}: col={col} row={i} spark={a} duck={b}")
            fails += 1
        else:
            print(f"OK   {name} ({len(s)} rows, {len(s.columns)} cols)")
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fails += 1

missing = [q for q in glob.glob(f"{out_dir}/q*") if os.path.basename(q) not in oracle]
for m in sorted(missing):
    n = os.path.basename(m)
    try:
        rows = con.execute(f"SELECT count(*) FROM read_parquet('{m}/*.parquet')").fetchone()[0]
        print(f"ROWS-ONLY {n}: {rows} rows")
    except Exception as e:
        print(f"ERROR {n}: {e}")
# rows-only queries (no oracle SQL) that errored in Verify leave neither
# a dump dir nor an oracle row — surface them from errors.json directly
for n in sorted(set(verify_errors) - set(oracle)):
    print(f"FAIL {n}: rows-only query errored in Verify ({verify_errors[n]})")
    fails += 1
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
