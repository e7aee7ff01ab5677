#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each SparkEntry query
dumped by graft.Verify into OUTDIR/<name>/, run the matching oracle SQL from
OUTDIR/oracle_sql.json in DuckDB over the same sf tables, sort columns by
name, and compare values exactly (hash-style). Dev tool only — the library
itself has no Python dependency.

Usage: python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_result(d):
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        return None
    con = duckdb.connect()
    return con.sql(f"select * from read_parquet({files!r})").df()

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from read_parquet('{p}')")
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    for name in names:
        spark_df = load_result(os.path.join(outdir, name))
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracle:
            ok = len(spark_df) > 0
            print(f"{'ROWS' if ok else 'FAIL'} {name}: rows-only, {len(spark_df)} rows")
            n_fail += 0 if ok else 1
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: cols spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1; continue
        bad = []
        for c in s.columns:
            sv, dv = s[c].to_numpy(), d[c].to_numpy()
            if sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
                eq = np.array_equal(sv.astype('f8'), dv.astype('f8'), equal_nan=True)
                if not eq:
                    diff = np.nanmax(np.abs(sv.astype('f8') - dv.astype('f8')))
                    bad.append(f"{c} (maxdiff={diff:.3e}, dtypes {sv.dtype}/{dv.dtype})")
            else:
                if sv.dtype != dv.dtype:
                    bad.append(f"{c} dtype {sv.dtype}!={dv.dtype}")
                elif not np.array_equal(sv, dv):
                    bad.append(c)
        if bad:
            print(f"FAIL {name}: value mismatch in {bad}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
