#!/usr/bin/env python3
"""Merge the sf1-scale ratio point: DuckDB side + artifact.

Usage: bench_sf1.py <sf1dir> <oracle_sql.json> <bench_sf1_spark.json> [out]

Runs the SAME committed oracle SQL as the correctness gate for the queries
`graft.tools.BenchSf1` timed, over the SAME densified parquet (Spark writes
directory-shaped parquet, so views glob `<t>.parquet/*.parquet` when the
path is a directory), with the same methodology (one warmup, min of 3
re-planned runs fetching all rows). Writes BENCH_sf1.json carrying BOTH
engines' per-query maps and the per-query ratios.

Full-suite honesty classification (round 11):
- oracles that read committed golden files (`goldens/…`) do no DuckDB-side
  work at sf1 — timing a parquet point-read against a real Spark pipeline
  would flatter nothing and compare nothing, so they are reported with
  duckdb = null, class = "golden-read";
- streaming replays (`_stream_` queries and the stateful session/upsert
  machines) pay micro-batch/state-store machinery a batch SQL
  reconstruction does not — DuckDB still runs their batch oracle, and the
  pair is recorded, but they are excluded from the headline ratio and
  carry class = "streaming-replay";
- everything else is class = "batch" and feeds the headline
  `batch_ratio` (spark_total / duckdb_total over batch pairs).
Each DuckDB query gets a 120 s interrupt guard so one pathological oracle
cannot wedge the capture (recorded as -2.0 = timeout).
"""
import json
import os
import sys
import threading
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

STREAM_MARKERS = ("_stream_",)
DUCK_TIMEOUT_S = 120.0


def classify(name, sql):
    if "goldens/" in sql:
        return "golden-read"
    if any(m in name for m in STREAM_MARKERS):
        return "streaming-replay"
    return "batch"


def main():
    sfdir, oracle_path, spark_path = sys.argv[1], sys.argv[2], sys.argv[3]
    out_path = sys.argv[4] if len(sys.argv) > 4 else "BENCH_sf1.json"
    # optional 5th arg: check_oracles.py --json output for a Verify dump at
    # the SAME densified dir — merged as the golden-read class's value-check
    # column (round 12: the LSH/sketch goldens carry the densified corpus
    # tags, so the eight formerly unchecked-at-sf1 queries are value-checked
    # at the bench's own scale point)
    value_check = json.load(open(sys.argv[5]))["verdicts"] if len(sys.argv) > 5 else None
    spark = json.load(open(spark_path))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(oracle_path))
    duck = {}
    classes = {}
    for name in sorted(spark["queries"]):
        sql = oracles.get(name)
        if sql is None:
            classes[name] = "no-oracle"
            duck[name] = None
            continue
        classes[name] = classify(name, sql)
        if classes[name] == "golden-read":
            duck[name] = None
            print(f"SF1DUCK {name:32s}   golden-read (no DuckDB-side work)")
            continue

        def run_once():
            timer = threading.Timer(DUCK_TIMEOUT_S, con.interrupt)
            timer.start()
            try:
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                return time.perf_counter() - t0
            finally:
                timer.cancel()
        try:
            run_once()
            duck[name] = round(min(run_once() for _ in range(3)), 6)
        except duckdb.InterruptException:
            print(f"DUCKDB-TIMEOUT {name} (> {DUCK_TIMEOUT_S}s)", file=sys.stderr)
            duck[name] = -2.0
        except Exception as e:
            print(f"DUCKDB-ERR {name}: {str(e)[:200]}", file=sys.stderr)
            duck[name] = -1.0
        print(f"SF1DUCK {name:32s} {duck[name]:8.3f} s  [{classes[name]}]")
    ratios = {n: (round(spark["queries"][n] / duck[n], 3)
                  if isinstance(duck.get(n), float) and duck[n] > 0
                  and spark["queries"][n] > 0 else None)
              for n in spark["queries"]}
    def paired(cls):
        return [n for n in duck
                if classes.get(n) == cls and isinstance(duck[n], float)
                and duck[n] > 0 and spark["queries"].get(n, -1) > 0]
    batch = paired("batch")
    streaming = paired("streaming-replay")
    artifact = {
        "sf": spark["sf"],
        "cores": spark["cores"],
        "threads": con.sql("SELECT current_setting('threads')").fetchone()[0],
        "duckdb": duckdb.__version__,
        "protocol": "identical parquet inputs, committed oracle SQL, one warmup + min-of-3 re-planned runs per engine; classes: batch (headline), streaming-replay (micro-batch machinery, excluded from headline), golden-read (no DuckDB-side work, duckdb=null)",
        "classes": classes,
        "spark_queries": spark["queries"],
        "duckdb_queries": duck,
        "ratio_spark_over_duckdb": ratios,
        "batch_spark_total": round(sum(spark["queries"][n] for n in batch), 6),
        "batch_duckdb_total": round(sum(duck[n] for n in batch), 6),
        "batch_ratio": round(sum(spark["queries"][n] for n in batch)
                             / sum(duck[n] for n in batch), 3) if batch else None,
        "streaming_spark_total": round(sum(spark["queries"][n] for n in streaming), 6),
        "streaming_duckdb_total": round(sum(duck[n] for n in streaming), 6),
        "golden_read_spark_total": round(sum(
            spark["queries"][n] for n in duck
            if classes.get(n) == "golden-read" and spark["queries"].get(n, -1) > 0), 6),
    }
    if "submetrics" in spark:
        artifact["submetrics"] = spark["submetrics"]
        artifact["submetric_notes"] = {
            "q129_search_only": "searchIvfIndex alone against a pre-built "
                "persisted index (same params/slices as q129; build untimed) "
                "— the deployment-mode search cost; the q129 row itself "
                "times rebuild+search+append for certification purity"}
    if value_check is not None:
        artifact["sf1_value_check"] = value_check
        artifact["sf1_value_check_note"] = (
            "check_oracles.py verdicts for a graft.Verify dump at this "
            "densified dir — value-level certification at the bench's own "
            "scale point for the listed queries (golden-read class included: "
            "the goldens carry the densified corpus tags since round 12)")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out_path}: batch {artifact['batch_spark_total']:.3f}s vs duckdb "
          f"{artifact['batch_duckdb_total']:.3f}s = {artifact['batch_ratio']}x "
          f"over {len(batch)} batch pairs "
          f"(+{len(streaming)} streaming pairs, "
          f"{sum(1 for c in classes.values() if c == 'golden-read')} golden-read)")


if __name__ == "__main__":
    main()
