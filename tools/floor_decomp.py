#!/usr/bin/env python3
"""Decompose the committed sf0.1 interleaved pair into cost classes and
write FLOOR_DECOMP.json — the arithmetic behind the round-13 proposal to
re-base the formal 2x bar on the sf1 point.

Usage: floor_decomp.py [BENCH_AB.json] [oracle_sql.json] [out]

Classes (each query lands in exactly one, first match):
  streaming-replay  '_stream_' queries: micro-batch/state-store/checkpoint
                    machinery with no DuckDB analog (the oracle times a
                    batch reconstruction); individually ceiling-bounded by
                    STREAM_BUDGET.json instead of a ratio
  golden-read       oracle reads a committed golden parquet — the DuckDB
                    'work' is a point file read, not the query
  artifact-rebuild  q114/q129 rebuild their persisted artifacts in-run by
                    design (certification purity; deployment pays the
                    search/gate submetric, committed separately)
  scheduling-floor  spark wall <= 0.45 s: DuckDB answers in micro/millis
                    while Spark pays its fixed per-query plan+schedule cost
  plan              everything else — the only class where a ratio measures
                    engine work

The headline arithmetic: even if every 'plan' query hit exactly 1.0x
DuckDB, the suite total would still be
streaming + rebuild + floor_spark + plan_duck, and the floor classes are
fixed costs that amortize with data volume, not plan defects. The sf1
point (BENCH_sf1.json batch_ratio) is where compute dominates the floor
and the bar measures the engine.
"""
import json
import sys

REBUILD = ("q114_", "q129_")


def main_sf1(path, out_path):
    """Same per-class arithmetic over BENCH_sf1.json (round 14): the 2x bar
    now lives at the sf1 point, so its headline (batch_ratio) gets the same
    decomposition the sf0.1 pair had. The artifact's own classes
    (streaming-replay / golden-read) are respected; the batch class is
    subdivided into artifact-rebuild / scheduling-floor / plan with the
    same rules — the per-query plan+schedule floor is a property of the
    host, not the SF, so the 0.45 s cut is unchanged."""
    b = json.load(open(path))
    sq, dq, cl = b["spark_queries"], b["duckdb_queries"], b["classes"]

    def classify(name):
        c = cl.get(name)
        if c in ("streaming-replay", "golden-read"):
            return c
        if name.startswith(REBUILD):
            return "artifact-rebuild"
        if 0 < sq.get(name, -1) <= 0.45:
            return "scheduling-floor"
        return "plan"

    classes = {}
    agg = {}
    for name, v in sq.items():
        c = classify(name)
        classes[name] = c
        a = agg.setdefault(c, {"n": 0, "spark": 0.0, "duckdb": 0.0})
        a["n"] += 1
        if v > 0:
            a["spark"] += v
        d = dq.get(name)
        if isinstance(d, float) and d > 0:
            a["duckdb"] += d
    for a in agg.values():
        a["spark"] = round(a["spark"], 3)
        a["duckdb"] = round(a["duckdb"], 3)
        a["ratio"] = round(a["spark"] / a["duckdb"], 3) if a["duckdb"] else None

    # the headline is the BATCH ratio: fixed batch classes are rebuild +
    # scheduling-floor; even at exact plan parity the batch ratio cannot go
    # below (fixed_spark + plan_duck) / batch_duck
    fixed = sum(agg.get(c, {"spark": 0})["spark"]
                for c in ("artifact-rebuild", "scheduling-floor"))
    plan = agg.get("plan", {"spark": 0.0, "duckdb": 0.0})
    best = round(fixed + plan["duckdb"], 3)
    d_tot = b["batch_duckdb_total"]
    out = {
        "source": path,
        "sf": b.get("sf"),
        "batch_spark_total": b["batch_spark_total"],
        "batch_duckdb_total": d_tot,
        "batch_ratio": b["batch_ratio"],
        "per_class": agg,
        "classes": classes,
        "floor_bound": {
            "fixed_batch_spark_cost_s": round(fixed, 3),
            "plan_class_at_parity_total_s": best,
            "batch_ratio_if_every_plan_query_hit_1x":
                round(best / d_tot, 3) if d_tot else None,
            "note": "the sf1 batch headline decomposed with the sf0.1 "
                "rules: artifact-rebuild and scheduling-floor walls are "
                "fixed per-query costs; the plan class is where the ratio "
                "measures engine work. Streaming replays and golden reads "
                "are already outside the batch headline (classes in "
                "BENCH_sf1.json), bounded by STREAM_BUDGET ceilings and "
                "value-checks respectively.",
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out_path}: fixed {fixed:.1f}s + plan-at-parity "
          f"{plan['duckdb']:.1f}s = {best:.1f}s vs duckdb {d_tot:.1f}s "
          f"(best achievable "
          f"{out['floor_bound']['batch_ratio_if_every_plan_query_hit_1x']}x; "
          f"actual {b['batch_ratio']}x; plan class "
          f"{plan['spark']:.1f}/{plan['duckdb']:.1f} = {agg['plan']['ratio']}x)")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--sf1":
        main_sf1(sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf1.json",
                 sys.argv[3] if len(sys.argv) > 3 else "FLOOR_DECOMP_sf1.json")
        return
    ab_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_AB.json"
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else None
    out_path = sys.argv[3] if len(sys.argv) > 3 else "FLOOR_DECOMP.json"
    ab = json.load(open(ab_path))
    oracles = json.load(open(oracle_path)) if oracle_path else {}

    def classify(name):
        if "_stream_" in name:
            return "streaming-replay"
        if name.startswith(REBUILD):
            return "artifact-rebuild"
        if "goldens/" in oracles.get(name, ""):
            return "golden-read"
        if ab["queries"][name]["spark_min"] <= 0.45:
            return "scheduling-floor"
        return "plan"

    classes = {}
    agg = {}
    for name, v in ab["queries"].items():
        c = classify(name)
        classes[name] = c
        a = agg.setdefault(c, {"n": 0, "spark": 0.0, "duckdb": 0.0})
        a["n"] += 1
        if v["spark_min"] > 0:
            a["spark"] += v["spark_min"]
        if isinstance(v["duckdb_min"], float) and v["duckdb_min"] > 0:
            a["duckdb"] += v["duckdb_min"]
    for a in agg.values():
        a["spark"] = round(a["spark"], 3)
        a["duckdb"] = round(a["duckdb"], 3)

    s_tot = ab["spark_total"]
    d_tot = ab["duckdb_total"]
    fixed = sum(agg.get(c, {"spark": 0})["spark"]
                for c in ("streaming-replay", "golden-read",
                          "artifact-rebuild", "scheduling-floor"))
    plan = agg.get("plan", {"spark": 0.0, "duckdb": 0.0})
    best = round(fixed + plan["duckdb"], 3)
    out = {
        "source": ab_path,
        "sf": ab.get("sf"),
        "spark_total": s_tot,
        "duckdb_total": d_tot,
        "ratio_total": round(s_tot / d_tot, 3) if d_tot else None,
        "per_class": agg,
        "classes": classes,
        "floor_bound": {
            "fixed_spark_cost_s": round(fixed, 3),
            "plan_class_at_parity_total_s": best,
            "ratio_if_every_plan_query_hit_1x": round(best / d_tot, 3)
                if d_tot else None,
            "note": "streaming/golden/rebuild/scheduling walls are fixed "
                "per-query costs on this 32-core single host; even with the "
                "plan class at exact DuckDB parity the suite cannot reach "
                "2x at this SF. These costs amortize with data volume: the "
                "same suite at the sf1 point (BENCH_sf1.json batch_ratio) "
                "is where the bar measures engine work — proposal: judge "
                "the formal 2x bar at sf1, keep the sf0.1 pair as the "
                "regression ledger (BENCH_DELTA bands + STREAM_BUDGET "
                "ceilings).",
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out_path}: fixed {fixed:.1f}s + plan-at-parity "
          f"{plan['duckdb']:.1f}s = {best:.1f}s vs duckdb {d_tot:.1f}s "
          f"(best achievable {out['floor_bound']['ratio_if_every_plan_query_hit_1x']}x; "
          f"actual {out['ratio_total']}x)")


if __name__ == "__main__":
    main()
