#!/usr/bin/env python3
"""Emit the DuckDB per-query wall-time baseline the bench is judged against.

Usage: bench_duckdb.py <sfdir> <oracle_sql.json> [out.json]

Runs every oracle SQL (the exact statements the correctness gate executes)
in DuckDB over the same parquet tables and times each with the bench's own
methodology — one untimed warmup, then min of 3 timed runs, each run
re-planning and fetching all result rows. Writes one JSON object:

    {"sf": ..., "threads": N, "duckdb": version,
     "queries": {name: seconds, ...}, "total": seconds}

so `bench_vs_baseline` is computable per query from committed artifacts
(bench_out.json vs DUCKDB_BASELINE.json) with no archaeology.
"""
import json
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sfdir = sys.argv[1]
    oracle_path = sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "DUCKDB_BASELINE.json"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(oracle_path))
    results = {}
    for name, sql in sorted(oracles.items()):
        def run_once():
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            return time.perf_counter() - t0
        try:
            run_once()  # warmup: catalog + file-footer caches
            results[name] = round(min(run_once() for _ in range(3)), 6)
        except Exception as e:
            print(f"DUCKDB-ERR {name}: {str(e)[:200]}", file=sys.stderr)
            results[name] = -1.0
    ok = {k: v for k, v in results.items() if v >= 0}
    artifact = {
        "sf": sfdir,
        "threads": con.sql("SELECT current_setting('threads')").fetchone()[0],
        "duckdb": duckdb.__version__,
        "queries": results,
        "total": round(sum(ok.values()), 6),
        "timed_queries": len(ok),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out_path}: {len(ok)} queries timed, total {artifact['total']:.3f}s "
          f"(threads={artifact['threads']}, duckdb={duckdb.__version__})")


if __name__ == "__main__":
    main()
