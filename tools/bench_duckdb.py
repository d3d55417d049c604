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

q74 exception (the honesty ledger's one special case): the committed
recursive-CTE oracle re-evaluates its tokenizing CTE every recursion step,
which is DuckDB fighting its own planner (~40-50 s at sf0.1 for a greedy
pack both engines compute in <1 s of real work) — a suite total carrying it
flatters Spark. The TIMED q74 is therefore an equivalent iterative
temp-table walk (same ordered greedy fold, tokens materialized once, one
tiny join per rank step, all work in-engine; constants parsed from the
committed SQL so they cannot drift) whose rows are asserted identical to
the recursive CTE's in-run. The recursive CTE remains the correctness
cross-check in check_oracles.py, and its own wall time is recorded
separately as `q74_recursive_cte_reference_s`.
"""
import glob
import json
import os
import re
import sys
import tempfile
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def q87_fair_sql(con, sfdir):
    """q87's FAIR timed formulation (round 13): a DuckDB query that reads
    the SAME two-snapshot parquet layout the engine reads and diffs it with
    a full-outer hash compare — the engine's actual work. The committed
    arithmetic oracle never touches the snapshots (membership is modular
    arithmetic on the base table), so timing it compared a 3M-row engine
    hash-diff against a 1.5M-row arithmetic scan (13.2x at sf1 was oracle
    asymmetry, COVERAGE.md). The layout is located by the same size:mtime
    signature StageDir embeds (staged by the Spark q87 warmup, which runs
    first in every capture tool); returns None when not staged — callers
    fall back to the arithmetic oracle and say so.

    Correctness stays anchored to the arithmetic oracle: callers assert the
    fair rows equal the committed oracle's rows in-run (the q74 pattern)."""
    st = os.stat(f"{sfdir}/orders.parquet")
    sig = f"snapdiff-v1-{st.st_size}-{st.st_mtime_ns // 10**6}"
    root = None
    for base in ("/dev/shm", tempfile.gettempdir()):
        hits = [p for p in glob.glob(f"{base}/graft_snapdiff_*.{sig}")
                if ".tmp." not in p]
        if hits:
            root = hits[0]
            break
    if root is None:
        return None
    old = f"{root}/snapshot_date=20260101/*.parquet"
    new = f"{root}/snapshot_date=20260102/*.parquet"
    # snapshot_date is the layout's partition tag, not row data — excluded
    # from the row hash exactly like the Spark side's dataCols filterNot
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{old}')").fetchall()
        if r[0] != "snapshot_date"]
    h = "hash(" + ", ".join(cols) + ")"
    return f"""
      WITH o AS (SELECT o_orderkey, {h} AS h FROM read_parquet('{old}')),
           n AS (SELECT o_orderkey, {h} AS h FROM read_parquet('{new}'))
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  ELSE 'changed' END AS change
      FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
      WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL OR o.h <> n.h
      ORDER BY o_orderkey"""


def q74_iterative(con, committed_sql):
    """Equivalent greedy pack as an iterative temp-table walk; returns rows
    sorted (shard, doc_id). Shard/budget constants are parsed out of the
    committed oracle SQL so the two formulations cannot drift apart."""
    shards = int(re.search(r"doc_id % (\d+) AS shard", committed_sql).group(1))
    budget = int(re.search(r"o\.tokens > (\d+)", committed_sql).group(1))
    con.execute(f"""CREATE OR REPLACE TEMP TABLE q74_ordered AS
        WITH base AS (
          SELECT doc_id % {shards} AS shard, doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) END AS tokens
          FROM documents)
        SELECT shard, doc_id, tokens,
               ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        FROM base""")
    con.execute("""CREATE OR REPLACE TEMP TABLE q74_prev AS
        SELECT shard, doc_id, tokens, rn, CAST(0 AS BIGINT) AS pack_id, tokens AS acc
        FROM q74_ordered WHERE rn = 1""")
    con.execute("CREATE OR REPLACE TEMP TABLE q74_result AS SELECT * FROM q74_prev")
    max_rn = con.sql("SELECT MAX(rn) FROM q74_ordered").fetchone()[0]
    for i in range(2, max_rn + 1):
        con.execute(f"""CREATE OR REPLACE TEMP TABLE q74_cur AS
            SELECT o.shard, o.doc_id, o.tokens, o.rn,
                   CASE WHEN p.acc > 0 AND p.acc + o.tokens > {budget}
                        THEN p.pack_id + 1 ELSE p.pack_id END AS pack_id,
                   CASE WHEN p.acc > 0 AND p.acc + o.tokens > {budget}
                        THEN o.tokens ELSE p.acc + o.tokens END AS acc
            FROM q74_ordered o JOIN q74_prev p ON o.shard = p.shard
            WHERE o.rn = {i}""")
        con.execute("INSERT INTO q74_result SELECT * FROM q74_cur")
        con.execute("CREATE OR REPLACE TEMP TABLE q74_prev AS SELECT * FROM q74_cur")
    return con.sql(
        "SELECT shard, doc_id, tokens, pack_id FROM q74_result ORDER BY shard, doc_id"
    ).fetchall()


def main():
    sfdir = sys.argv[1]
    oracle_path = sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "DUCKDB_BASELINE.json"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(oracle_path))
    results = {}
    q74_cte_ref = None
    q87_arith_ref = None
    q87_fair_used = False
    for name, sql in sorted(oracles.items()):
        is_q74 = name.startswith("q74_")
        fair87 = q87_fair_sql(con, sfdir) if name.startswith("q87_") else None

        def run_once():
            t0 = time.perf_counter()
            if is_q74:
                rows = q74_iterative(con, sql)
            elif fair87 is not None:
                rows = con.sql(fair87).fetchall()
            else:
                rows = con.sql(sql).fetchall()
            return time.perf_counter() - t0, rows
        try:
            _, warm_rows = run_once()  # warmup: catalog + file-footer caches
            results[name] = round(min(run_once()[0] for _ in range(3)), 6)
            if is_q74:
                # ledger: one timed run of the committed recursive CTE, and
                # an in-run proof the timed walk computes the same rows
                t0 = time.perf_counter()
                cte_rows = con.sql(sql).fetchall()
                q74_cte_ref = round(time.perf_counter() - t0, 6)
                if sorted(cte_rows) != sorted(warm_rows):
                    raise RuntimeError("q74 iterative walk != recursive CTE rows")
            if fair87 is not None:
                # ledger: the committed arithmetic oracle's own wall, and
                # an in-run proof the fair layout-reading diff computes the
                # same rows (the q74 pattern)
                q87_fair_used = True
                t0 = time.perf_counter()
                arith_rows = con.sql(sql).fetchall()
                q87_arith_ref = round(time.perf_counter() - t0, 6)
                if sorted(arith_rows) != sorted(warm_rows):
                    raise RuntimeError("q87 fair snapshot diff != arithmetic oracle rows")
            elif name.startswith("q87_"):
                print("q87: snapshot layout not staged in this window — timed "
                      "the arithmetic oracle (run the Spark side first for "
                      "the fair pair)", file=sys.stderr)
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
        "q74_timed_formulation": "iterative temp-table walk, row-identical to "
            "the committed recursive-CTE oracle (asserted in-run); the CTE "
            "remains the correctness cross-check",
        "q74_recursive_cte_reference_s": q74_cte_ref,
        "q87_timed_formulation": ("full-outer hash diff over the SAME staged "
            "two-snapshot parquet layout the engine reads, row-identical to "
            "the committed arithmetic oracle (asserted in-run); the "
            "arithmetic oracle remains the correctness cross-check"
            if q87_fair_used else
            "arithmetic oracle (snapshot layout was not staged in this "
            "window)"),
        "q87_arithmetic_reference_s": q87_arith_ref,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out_path}: {len(ok)} queries timed, total {artifact['total']:.3f}s "
          f"(threads={artifact['threads']}, duckdb={duckdb.__version__})")


if __name__ == "__main__":
    main()
