#!/usr/bin/env python3
"""Persistent DuckDB oracle timer — the engine-B half of the
interleaved bench (graft.tools.InterleavedBench). Reads query names on
stdin, one per line; executes the oracle SQL (from argv[2]) against
the parquet views over argv[1]; prints the execution's wall seconds,
one line per request. The caller owns warm/median discipline — it
sends each name once per round, alternating engines per query, so the
Spark and DuckDB samples of a query land on the same box state.
"""
import json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_json))
    for line in sys.stdin:
        name = line.strip()
        if not name:
            continue
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            print(f"{time.time() - t0:.6f}", flush=True)
        except Exception as e:  # report, keep the pipe alive
            print(f"ERR {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
