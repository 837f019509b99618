#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs Verify output.

Mimics the driver's correctness gate DTYPE-FAITHFULLY:
  - Spark side: pyarrow.parquet.read_table(...).to_pandas()
    (decimals stay decimal.Decimal objects, as the driver sees them)
  - Oracle side: duckdb con.execute(sql).df()
    (decimals lower to float64, as the driver sees them)
Then compares schemas (column names sorted) and values (rows sorted,
columns ordered by name, string-rendered) — the same surface the driver
hashes. Round 1 shipped blind because the old version of this tool read
BOTH sides through DuckDB, so decimal-vs-float rendering matched locally
but not at the driver.

Usage: python3 tools/check_verify.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    errs_path = os.path.join(out_dir, "errors.json")
    if os.path.exists(errs_path):
        for name, msg in sorted(json.load(open(errs_path)).items()):
            print(f"SPARK-FAIL {name}: {msg[:160]}")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            # dtype-faithful: pyarrow -> pandas, NOT via duckdb
            got = pq.ParquetDataset(spark_dir).read().to_pandas()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}"); n_fail += 1; continue
        g = got[gc].sort_values(gc).reset_index(drop=True)
        w = want[wc].sort_values(wc).reset_index(drop=True)
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}"); n_fail += 1; continue
        # value compare via string render (the driver hashes rendered values)
        gs = g.astype(str); ws = w.astype(str)
        if not gs.equals(ws):
            diff = (gs != ws).any(axis=1)
            print(f"FAIL {name}: {diff.sum()} mismatched rows; first:")
            idx = diff[diff].index[0]
            print("  spark:", gs.loc[idx].to_dict())
            print("  duck :", ws.loc[idx].to_dict())
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
