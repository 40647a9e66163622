#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read Verify's parquet
outputs, run each oracle SQL in DuckDB over the same sf dir, compare.
Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types: decimals -> str, timestamps -> str, floats -> round
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
        elif df[c].dtype == float:
            df[c] = df[c].round(6)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            # driver fixtures are single files; Spark-generated scaled dirs
            # (tools/GenScale.scala) are directories of part files
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted([os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                    if os.path.isdir(d)])
    n_pass = n_fail = n_weak = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_df = pq.read_table(files[0]).to_pandas()
        if name not in oracles:
            print(f"WEAK {name}: rows={len(spark_df)} (no oracle)")
            n_weak += 1
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        neq = (a.fillna("<N>").astype(str) != b.fillna("<N>").astype(str))
        if neq.any().any():
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} mismatched rows; first:")
            i = bad.idxmax()
            print("  spark:", a.loc[i].to_dict())
            print("  duck :", b.loc[i].to_dict())
            n_fail += 1; continue
        print(f"PASS {name}: {len(a)} rows")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_weak} weak")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
