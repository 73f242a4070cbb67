#!/usr/bin/env python3
"""Time the DuckDB oracle side of the bench: run every oracle SQL
sequentially against the sf dir and print ONE JSON line
{"seconds": N, "n": M, "failed": [...]} — invoked by graft.Bench so
BENCH_FULL.json carries its own Spark/DuckDB ratio measured on the
same machine at the same moment (the r6 lesson: numbers from
different load windows are not comparable).

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json>
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(oracle_path) as f:
        oracles = json.load(f)
    failed = []
    per_query = {}
    t0 = time.time()
    for name, sql in sorted(oracles.items()):
        q0 = time.time()
        try:
            con.execute(sql).fetchall()
        except Exception:
            failed.append(name)
        per_query[name] = round(time.time() - q0, 4)
    total = time.time() - t0
    print(json.dumps({"seconds": round(total, 3),
                      "n": len(oracles), "failed": failed,
                      "per_query": per_query}))


if __name__ == "__main__":
    main()
