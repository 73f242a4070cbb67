#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify.scala output dir (parquet per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf dir, and compares:
row count, column names (sorted), and a hash of the sorted values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> ns, floats -> round-trip via repr
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        else:
            try:
                df[c] = df[c].astype("float64")
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            actual = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            n_fail += 1
            continue
        try:
            expected = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        a, e = canon(actual), canon(expected)
        if list(a.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(a.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(a) != len(e):
            print(f"FAIL {name}: rows {len(a)} != {len(e)}")
            n_fail += 1
            continue
        if not a.equals(e):
            diff_cols = [c for c in a.columns if not a[c].equals(e[c])]
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                neq = a[c] != e[c]
                print(f"  {c}: spark={a[c][neq].head(3).tolist()} "
                      f"duck={e[c][neq].head(3).tolist()}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(a)} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
