#!/usr/bin/env python3
"""Dev-only replica of the driver's t2 correctness gate: run each
SparkEntry.oracleSql in DuckDB over the same parquet tables and compare to
the parquet dumps Verify.scala wrote. Not part of the shipped library
(driver-side python/duckdb only)."""
import json
import math
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"create or replace view {t} as select * from '{SF_DIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)

ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetch_arrow_table()
        got = con.execute(
            f"select * from '{OUT_DIR}/{name}/*.parquet'").fetch_arrow_table()
        e_cols = sorted(exp.column_names)
        g_cols = sorted(got.column_names)
        if e_cols != g_cols:
            bad.append((name, f"schema {g_cols} != {e_cols}"))
            continue
        if exp.num_rows != got.num_rows:
            bad.append((name, f"rows {got.num_rows} != {exp.num_rows}"))
            continue
        e_rows = [[canon(v) for v in row] for row in
                  zip(*[exp.column(c).to_pylist() for c in e_cols])]
        g_rows = [[canon(v) for v in row] for row in
                  zip(*[got.column(c).to_pylist() for c in g_cols])]
        if e_rows != g_rows:
            diff = next(i for i, (a, b) in enumerate(zip(e_rows, g_rows))
                        if a != b)
            bad.append((name,
                        f"row {diff}: got {g_rows[diff]} exp {e_rows[diff]}"))
            continue
        ok.append(name)
    except Exception as ex:  # noqa: BLE001
        bad.append((name, f"error: {ex}"))

print(f"OK {len(ok)}/{len(oracle)}")
for name, why in bad:
    print(f"FAIL {name}: {why}")
sys.exit(1 if bad else 0)
