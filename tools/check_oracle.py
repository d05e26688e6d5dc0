#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB running SparkEntry.oracleSql on the same sf dir.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd


def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf
    return str(a) == str(b)


def compare(name, sdf, ddf):
    problems = []
    scols = sorted(sdf.columns)
    dcols = sorted(ddf.columns)
    if scols != dcols:
        return [f"schema: spark={scols} duck={dcols}"]
    if len(sdf) != len(ddf):
        return [f"rows: spark={len(sdf)} duck={len(ddf)}"]
    sdf = norm(sdf)
    ddf = norm(ddf)
    for col in scols:
        sv = sdf[col].tolist()
        dv = ddf[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not values_equal(a, b):
                problems.append(f"value[{col}][row {i}]: spark={a!r} duck={b!r}")
                if len(problems) > 3:
                    return problems
    return problems


def main():
    sf_dir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        stem = os.path.basename(f)[:-len(".parquet")]
        con.execute(
            f"CREATE OR REPLACE VIEW {stem} AS SELECT * FROM read_parquet('{f}')")
    with open(os.path.join(outdir, "oracle_sql.json")) as fh:
        oracle = json.load(fh)

    all_queries = sorted(
        d for d in os.listdir(outdir)
        if os.path.isdir(os.path.join(outdir, d)))
    n_ok = n_bad = n_rowsonly = 0
    for name in all_queries:
        sdf = load_spark(outdir, name)
        if sdf is None:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        if name not in oracle:
            print(f"ROWS-ONLY {name}: rows={len(sdf)}")
            n_rowsonly += 1
            continue
        try:
            ddf = con.execute(oracle[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex).splitlines()[0]}")
            n_bad += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:4]))
            n_bad += 1
        else:
            print(f"OK   {name} rows={len(sdf)}")
            n_ok += 1
    missing = sorted(set(oracle) - set(all_queries))
    for m in missing:
        print(f"FAIL {m}: oracle present but no spark output dir")
        n_bad += 1
    print(f"\n== {n_ok} ok, {n_bad} fail, {n_rowsonly} rows-only "
          f"of {len(all_queries)} queries ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
