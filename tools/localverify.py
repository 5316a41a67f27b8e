#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs the DuckDB oracle.

Mirrors the driver's gate: for each query, load the Spark-written parquet
and the DuckDB result of the oracle SQL (tables registered from the sf
dir), sort columns by name, sort rows, and compare. Reports exact-match
plus max float deviation so precision issues surface before the round's
CORRECTNESS run. Driver-side tooling only — the engine never imports this.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_tables(con, sfdir):
    # driver testdata tables are single files (<t>.parquet); generated
    # lakes (GenLake/GenCorpus) are Spark-written DIRECTORIES of parts
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, ints to int64
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64" if df[c].isna().any() else "int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)

def compare(name, spark_df, duck_df):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS MISMATCH spark={len(a)} duck={len(b)}"
    issues = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype("float64"); bv = bv.astype("float64")
            both = ~(av.isna() | bv.isna())
            if (av.isna() != bv.isna()).any():
                issues.append(f"{c}: null mask differs"); continue
            diff = (av[both] - bv[both]).abs()
            if len(diff) and diff.max() > 0:
                issues.append(f"{c}: max abs diff {diff.max():.3e} "
                              f"({int((diff > 0).sum())} rows differ)")
        else:
            neq = (av.astype(str) != bv.astype(str))
            if neq.any():
                i = int(neq.idxmax())
                issues.append(f"{c}: {int(neq.sum())} rows differ, first at {i}: "
                              f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
    return "; ".join(issues) if issues else None

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    load_tables(con, sfdir)
    n_ok = n_bad = n_noracle = 0
    declared = set()
    qfile = os.path.join(outdir, "queries.txt")
    if os.path.exists(qfile):
        declared = set(open(qfile).read().split())
    produced = {os.path.basename(d.rstrip("/")) for d in glob.glob(f"{outdir}/*/")}
    for missing in sorted(declared - produced):
        if not only or missing in only:
            print(f"[FAIL] {missing}: query threw (no output dir)"); n_bad += 1
    for qdir in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        if only and name not in only: continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output"); n_bad += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_df)} rows"); n_noracle += 1; continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}"); n_bad += 1; continue
        res = compare(name, spark_df, duck_df)
        if res: print(f"[FAIL] {name}: {res}"); n_bad += 1
        else: print(f"[ok] {name} ({len(spark_df)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail, {n_noracle} rows-only")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
