#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's t2 gate.

Usage: python3 tools/check.py [sf_dir] [out_dir]

Runs graft.Verify via sbt (unless out_dir already has fresh dumps and
--no-run is passed), then for each query with an oracle: runs the oracle
SQL in DuckDB over the same parquet tables, and compares against the
Spark parquet dump (columns sorted by name, rows sorted by all columns,
exact value equality).
"""
import json, os, subprocess, sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_verify():
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    if "[success]" not in r.stdout:
        print(r.stdout[-4000:], r.stderr[-2000:])
        sys.exit(1)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # normalize widths (int32 vs int64, float32 vs float64) but keep
    # int-vs-float distinct — a 27 vs 27.0 mismatch is a real type bug
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
    return df


def main():
    if "--no-run" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
            got = pd.read_parquet(f"{OUT}/{name}")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        e_c, g_c = canon(exp), canon(got)
        if list(e_c.columns) != list(g_c.columns):
            print(f"FAIL {name}: columns {list(g_c.columns)} != oracle {list(e_c.columns)}")
            n_fail += 1
        elif len(e_c) != len(g_c):
            print(f"FAIL {name}: rows {len(g_c)} != oracle {len(e_c)}")
            n_fail += 1
        elif not e_c.equals(g_c):
            diff = (e_c != g_c).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(e_c)} rows differ; first:")
            i = diff.idxmax()
            print("  oracle:", e_c.loc[i].to_dict())
            print("  spark :", g_c.loc[i].to_dict())
            n_fail += 1
        else:
            print(f"PASS {name} ({len(e_c)} rows)")
            n_pass += 1
    # rows-only queries
    for d in sorted(os.listdir(OUT)):
        if os.path.isdir(f"{OUT}/{d}") and d not in oracle:
            n = len(pd.read_parquet(f"{OUT}/{d}"))
            print(f"ROWS {d}: {n} rows {'(EMPTY!)' if n == 0 else ''}")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracle queries")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
