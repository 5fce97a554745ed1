#!/usr/bin/env python3
"""Dev-only harness replicating the driver's DuckDB-oracle compare.

Usage: python3 scripts/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the same
sf tables, sorts columns by name, sorts rows, and compares values.
NOT part of the shipped library (driver-side python is available here).
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        want = canon(con.execute(sql).fetchdf())
        ok_schema = list(got.columns) == list(want.columns)
        ok_rows = len(got) == len(want)
        ok_vals = False
        if ok_schema and ok_rows:
            try:
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                print(f"  diff {name}: {str(e)[:300]}")
        if ok_schema and ok_rows and ok_vals:
            # exact bit compare of values as strings too (hash analog)
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: schema={ok_schema} "
                  f"rows={ok_rows}({len(got)}/{len(want)}) vals={ok_vals}")
            if not ok_schema:
                print(f"  got:  {list(got.columns)}")
                print(f"  want: {list(want.columns)}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
