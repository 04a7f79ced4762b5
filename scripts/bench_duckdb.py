#!/usr/bin/env python3
"""DuckDB side of the bench comparison (BENCH_NOTES.md methodology).

Runs the IDENTICAL oracle SQL the driver's correctness gate uses
(oracle_sql.json, dumped by graft.Verify) against the same parquet
fixtures, 32 threads, and reports per-query single-run (fresh
connection, first execution) and warm (best of 3) seconds as one JSON
line — the DuckDB columns of the BENCH_NOTES table.

Usage: bench_duckdb.py SF_DIR ORACLE_SQL_JSON [name_filter,...]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    # fixtures referenced by the ANN/LSH oracles (same files Spark reads)
    import os
    fdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures")
    if os.path.isdir(fdir):
        for f in os.listdir(fdir):
            if f.endswith(".parquet"):
                con.execute(
                    f"CREATE VIEW {f[:-8]} AS SELECT * FROM "
                    f"read_parquet('{fdir}/{f}')")
    return con


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    pats = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    oracles = json.load(open(oracle_path))
    names = [n for n in sorted(oracles)
             if pats is None or any(p in n for p in pats)]
    single, warm = {}, {}
    for n in names:
        sql = oracles[n]
        con = connect(sf_dir)  # fresh connection: cold/single-run
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
        except Exception as e:
            print(f"[duckdb-bench] {n}: {e}", file=sys.stderr)
            con.close()
            continue
        single[n] = time.time() - t0
        runs = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            runs.append(time.time() - t0)
        warm[n] = min(runs)
        con.close()
    print(json.dumps({
        "metric": "duckdb_total", "value": sum(warm.values()),
        "unit": "sec", "queries": warm,
        "single_total": sum(single.values()), "queries_single": single,
        "threads": 32, "sf": sf_dir,
        "duckdb_version": duckdb.__version__}))


if __name__ == "__main__":
    main()
