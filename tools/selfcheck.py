#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare (t2).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: read the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (with views
over <sfDir>/*.parquet), and compare row count + schema + values.

This mirrors the DRIVER comparator, which is stricter than a naive
diff in two ways that have historically shipped hidden defects:

1. Rows are SORTED on all columns (pandas sort_values) before
   comparing — a non-atomic (array/list) cell makes that sort raise
   `TypeError: unhashable type`, exactly as it does driver-side, so
   declared queries must emit only atomic columns. The sort is applied
   to rows-only results too (the driver sorts those as well).
2. Cells keep their Python type in the repr: an int 975 and a float
   975.0 are DIFFERENT values. DuckDB silently promotes `sum(int)` to
   HUGEINT which lands in pandas as float64 — a bare `sum(...)` in
   oracle SQL therefore fails the compare even when the numbers agree.
   Floats use full repr (no significant-digit coercion), so
   13th-digit drift is visible, not masked.

The script also warns when an oracle column comes back HUGEINT /
DECIMAL-typed from DuckDB (run `DESCRIBE`), pointing at the missing
`CAST(... AS BIGINT/DOUBLE)`.
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # Mirror the driver: keep int/float distinction, full float repr.
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "item") and type(v).__module__ == "numpy" \
            and type(v).__name__ != "ndarray":
        return norm_cell(v.item())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_repr(df):
    """Column-sort, row-sort (driver-faithful: raises TypeError on
    array cells), then normalize every cell."""
    df = df[sorted(df.columns)]
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return [tuple(norm_cell(v) for v in row)
            for row in df.itertuples(index=False)]


def oracle_type_warnings(con, sql):
    """DESCRIBE the oracle SQL; flag HUGEINT/decimal columns that the
    driver renders as floats (the bare-sum class)."""
    try:
        desc = con.execute("DESCRIBE " + sql).fetchall()
    except Exception:
        return []
    bad = [(c, t) for (c, t, *_rest) in desc
           if "HUGEINT" in t.upper() or "DECIMAL" in t.upper()]
    return bad


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
            try:
                frame_repr(spark_df)  # driver sorts rows-only results too
            except TypeError as e:
                print(f"{name:24s} FAIL unsortable output (array/map column "
                      f"crashes the driver comparator): {e}")
                n_fail += 1
                continue
            status = f"ROWS-ONLY rows={len(spark_df)}" + \
                (" !! EMPTY" if len(spark_df) == 0 else "")
            n_rowsonly += 1
            print(f"{name:24s} {status}")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name:24s} FAIL oracle-sql-error: {e}")
            n_fail += 1
            continue
        for c, t in oracle_type_warnings(con, oracle[name]):
            print(f"{name:24s} WARN oracle column `{c}` is {t} — driver "
                  f"renders it float; CAST(... AS BIGINT/DOUBLE) in the SQL")
        try:
            a, b = frame_repr(spark_df), frame_repr(duck_df)
        except TypeError as e:
            print(f"{name:24s} FAIL unsortable output (array/map column "
                  f"crashes the driver comparator): {e}")
            n_fail += 1
            continue
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
