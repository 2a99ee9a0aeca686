#!/usr/bin/env python3
"""Scale the sf0.1 test corpus 10x into an sf1-shaped corpus for
performance experiments (round-17 scale-evidence runs).

Method: 10 deterministic key-offset copies of every scale-proportional
table. Each copy is internally FK-consistent (all key columns shift by
the same per-copy offset), so joins behave like a 10x database: 10x the
rows, 10x the distinct join keys, identical per-key fan-out and value
distributions. Fixed-size dimensions (region, nation) are copied
verbatim, exactly like TPC-H's constant dims.

This corpus is for MEASUREMENT ONLY (operator cost vs the sf0.1 job
floor). The driver's correctness gate stays on /root/testdata/sf* which
this script never touches. Output dir: /root/testdata_sf1 (not in git).

Deterministic: pure function of the input files; no RNG.
"""
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import os, sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_sf1"
COPIES = 10
# One offset unit larger than any key in any table (max is l_orderkey ~600k).
OFFSET = 10_000_000

# Key columns to shift per copy, per table. Everything else is copied as-is.
KEYS = {
    "customer":   ["c_custkey"],
    "documents":  ["doc_id"],
    "embeddings": ["vec_id"],
    "events":     ["event_id", "user_id"],
    "lineitem":   ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders":     ["o_orderkey", "o_custkey"],
    "part":       ["p_partkey"],
    "supplier":   ["s_suppkey"],
    # fixed dims, no scaling
    "region": [],
    "nation": [],
}

os.makedirs(DST, exist_ok=True)
for name, keys in KEYS.items():
    t = pq.read_table(f"{SRC}/{name}.parquet")
    if not keys:
        pq.write_table(t, f"{DST}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (dim, copied verbatim)")
        continue
    parts = []
    for i in range(COPIES):
        c = t
        if i > 0:
            for k in keys:
                idx = c.schema.get_field_index(k)
                shifted = pc.add(c.column(k), pa.scalar(i * OFFSET, type=pa.int64()))
                c = c.set_column(idx, k, shifted)
        parts.append(c)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {out.num_rows} rows")
print("done ->", DST)
