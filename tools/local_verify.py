#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare against the Spark result parquet
(columns sorted by name, rows sorted, values compared cell-by-cell).

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import math

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v

def norm(df):
    df = df[sorted(df.columns)]
    rows = [tuple(norm_cell(v) for v in r) for r in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))

fails = 0
for name in sorted(oracle):
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        sdf = con.execute(
            f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    sn, on = norm(sdf), norm(odf)
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
        fails += 1
    elif sn != on:
        print(f"FAIL {name}: rows spark={len(sn)} oracle={len(on)}")
        for i, (a, b) in enumerate(zip(sn, on)):
            if a != b:
                print(f"  first diff at row {i}:\n    spark : {a}\n    oracle: {b}")
                break
        if len(sn) != len(on):
            only_s = [r for r in sn if r not in on][:3]
            only_o = [r for r in on if r not in sn][:3]
            print(f"  only-spark: {only_s}\n  only-oracle: {only_o}")
        fails += 1
    else:
        print(f"PASS {name} ({len(sn)} rows)")

print(f"\n{len(oracle) - fails}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
