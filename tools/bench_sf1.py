#!/usr/bin/env python3
"""Merge the sf1-scale ratio point: DuckDB side + artifact.

Usage: bench_sf1.py <sf1dir> <oracle_sql.json> <bench_sf1_spark.json> [out]

Runs the SAME committed oracle SQL as the correctness gate for the queries
`graft.tools.BenchSf1` timed, over the SAME densified parquet (Spark writes
directory-shaped parquet, so views glob `<t>.parquet/*.parquet` when the
path is a directory), with the same methodology (one warmup, min of 3
re-planned runs fetching all rows). Writes BENCH_sf1.json carrying BOTH
engines' per-query maps and the per-query ratios.
"""
import json
import os
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sfdir, oracle_path, spark_path = sys.argv[1], sys.argv[2], sys.argv[3]
    out_path = sys.argv[4] if len(sys.argv) > 4 else "BENCH_sf1.json"
    spark = json.load(open(spark_path))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(oracle_path))
    duck = {}
    for name in sorted(spark["queries"]):
        sql = oracles[name]

        def run_once():
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            return time.perf_counter() - t0
        try:
            run_once()
            duck[name] = round(min(run_once() for _ in range(3)), 6)
        except Exception as e:
            print(f"DUCKDB-ERR {name}: {str(e)[:200]}", file=sys.stderr)
            duck[name] = -1.0
        print(f"SF1DUCK {name:24s} {duck[name]:8.3f} s")
    ratios = {n: (round(spark["queries"][n] / duck[n], 3)
                  if duck.get(n, -1) > 0 and spark["queries"][n] > 0 else None)
              for n in spark["queries"]}
    ok = [n for n in duck if duck[n] >= 0 and spark["queries"][n] >= 0]
    artifact = {
        "sf": spark["sf"],
        "cores": spark["cores"],
        "threads": con.sql("SELECT current_setting('threads')").fetchone()[0],
        "duckdb": duckdb.__version__,
        "protocol": "identical parquet inputs, committed oracle SQL, one warmup + min-of-3 re-planned runs per engine",
        "spark_queries": spark["queries"],
        "duckdb_queries": duck,
        "ratio_spark_over_duckdb": ratios,
        "spark_total": round(sum(spark["queries"][n] for n in ok), 6),
        "duckdb_total": round(sum(duck[n] for n in ok), 6),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out_path}: spark {artifact['spark_total']:.3f}s vs duckdb "
          f"{artifact['duckdb_total']:.3f}s over {len(ok)} queries")


if __name__ == "__main__":
    main()
