#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare (t2).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: read the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (with views
over <sfDir>/*.parquet), sort columns by name, and compare row count +
values (hash of stringified cells, floats rounded to 9 significant
digits to mimic a value-hash compare).
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_repr(df):
    df = df[sorted(df.columns)]
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        spark_df = pq.read_table(os.path.join(out_dir, name)).to_pandas()
        if name not in oracle:
            status = f"ROWS-ONLY rows={len(spark_df)}" + (" !! EMPTY" if len(spark_df) == 0 else "")
            n_rowsonly += 1
            print(f"{name:24s} {status}")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name:24s} FAIL oracle-sql-error: {e}")
            n_fail += 1
            continue
        a, b = frame_repr(spark_df), frame_repr(duck_df)
        if len(a) != len(b):
            print(f"{name:24s} FAIL rowcount spark={len(a)} duck={len(b)}")
            n_fail += 1
        elif sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"{name:24s} FAIL columns spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
            n_fail += 1
        elif a != b:
            diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"{name:24s} FAIL values; first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"{name:24s} PASS rows={len(a)}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
