#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load the Spark parquet result,
run the corresponding oracle SQL in DuckDB over the sf-dir tables,
sort columns by name + rows by all columns, and compare values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    # normalize dtypes a bit for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df

def main(sf_dir, out_dir, json_out=None):
    res = {}
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0

    def record(name, rows=None, orows=None, err=None, rm=True, sm=True, hm=True):
        res[name] = {"rows_match": rm, "schema_match": sm, "hash_match": hm,
                     "spark_rows": rows, "oracle_rows": orows, "err": err}

    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: spark output missing"); n_fail += 1
            record(name, err="spark output missing"); continue
        try:
            sdf = norm(pd.concat([pd.read_parquet(f) for f in
                                  sorted(glob.glob(f"{spark_dir}/*.parquet"))],
                                 ignore_index=True))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1
            record(name, err=f"cannot read spark output: {e}"); continue
        try:
            ddf = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1
            record(name, err=f"oracle sql error: {e}"); continue
        if list(sdf.columns) != list(ddf.columns):
            print(f"FAIL {name}: columns {list(sdf.columns)} vs {list(ddf.columns)}")
            n_fail += 1
            record(name, len(sdf), len(ddf), sm=False, hm=False); continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(ddf)}"); n_fail += 1
            record(name, len(sdf), len(ddf), rm=False, hm=False); continue
        ok = True
        for c in sdf.columns:
            a, b = sdf[c].values, ddf[c].values
            if np.issubdtype(sdf[c].dtype, np.floating):
                bad = ~(np.isclose(a.astype(float), b.astype(float),
                                   rtol=0, atol=0, equal_nan=True))
            else:
                bad = ~((pd.isna(a) & pd.isna(b)) | (a == b))
            if bad.any():
                i = int(np.argmax(bad))
                print(f"FAIL {name}: col {c} row {i}: spark={a[i]!r} duck={b[i]!r} "
                      f"({int(bad.sum())} diffs)")
                ok = False; break
        record(name, len(sdf), len(ddf), hm=ok)
        if ok:
            print(f"PASS {name} ({len(sdf)} rows)"); n_pass += 1
        else:
            n_fail += 1
    if json_out:
        json.dump(res, open(json_out, "w"), indent=1)
        print(f"wrote {json_out}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else None)
