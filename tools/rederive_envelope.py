#!/usr/bin/env python3
"""Re-derive contested markings in BENCH_ENVELOPE.json from the committed
flag history (r18, verdict What's-wrong #1: the envelope rule admitted
flagged windows into its own bounds — q107's r17 final-capture flag was
auto-closed against envelope hi 0.752 s, the very wall the r16 12:04 window
flagged; under the pre-drift envelope [0.448-0.596] it stays open).

A window's sample on query Q becomes contested when:
  1. the BENCH_DELTA.json committed for that capture left Q in
     `open_flags` (for pre-r16 artifacts without the field, in `flagged` —
     conservative: those flags were only adjudicated manually after the
     fact, so at capture time they were unresolved by definition), or
  2. FIXPOINT: the capture auto-closed Q's flag as envelope-drift but the
     cited isolated min falls OUTSIDE the contested-excluded envelope
     rebuilt from the windows before that capture — the closure rested on
     a contested bound, so the sample inherits the contest.

Window -> delta matching is by VALUE, not commit archaeology: each capture
writes both artifacts from one `per` map, so BENCH_DELTA.queries[q].cur
(3-decimal) matches the envelope sample spark_min (6-decimal) to within
5e-4 on essentially every query of that window; the delta version with the
highest match fraction (required >= 0.9 over >= 50 queries) is that
window's capture.

Normally run once (the r18 migration); safe to re-run — markings are
recomputed for windows with a committed delta, while windows a live
capture recorded itself (its own contested marks, full-set `_suite`
fpsets and verdicts) are preserved untouched; tools/bench_ab.py
maintains everything going forward.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENVELOPE_PATH = f"{REPO}/BENCH_ENVELOPE.json"
TOL = 0.0006


def delta_versions():
    """All committed BENCH_DELTA.json versions, oldest first."""
    shas = subprocess.check_output(
        ["git", "log", "--reverse", "--format=%H", "--", "BENCH_DELTA.json"],
        cwd=REPO, text=True).split()
    out = []
    for sha in shas:
        blob = subprocess.run(["git", "show", f"{sha}:BENCH_DELTA.json"],
                              capture_output=True, text=True, cwd=REPO)
        if blob.returncode != 0 or not blob.stdout.strip():
            continue
        try:
            out.append((sha[:7], json.loads(blob.stdout)))
        except json.JSONDecodeError:
            continue
    return out


def match_window(win_samples, deltas):
    """Best-matching delta version for one window's {q: spark_min} map."""
    best, best_frac = None, 0.0
    for sha, d in deltas:
        dq = d.get("queries", {})
        common = [q for q in win_samples if q in dq]
        if len(common) < 50:
            continue
        hits = sum(1 for q in common
                   if abs(dq[q].get("cur", -1) - win_samples[q]) <= TOL)
        frac = hits / len(common)
        if frac > best_frac:
            best, best_frac = (sha, d), frac
    return (best, best_frac) if best_frac >= 0.9 else (None, best_frac)


def main():
    env = json.load(open(ENVELOPE_PATH))
    deltas = delta_versions()
    report = []
    for sf, bucket in env.get("per_sf", {}).items():
        # window -> {q: sample dict}; reserved "_"-keys (the _suite bucket
        # a previous run wrote) are not query samples
        windows = {}
        for q, entries in bucket.items():
            if q.startswith("_"):
                continue
            for e in entries:
                windows.setdefault(e["window"], {})[q] = e
        # phase 1: direct open-flag markings, recomputed from scratch
        win_contested = {}   # window -> {q: reason}
        win_delta = {}
        for w in sorted(windows):
            samples = {q: e["spark_min"] for q, e in windows[w].items()}
            m, frac = match_window(samples, deltas)
            if m is None:
                report.append(f"{sf} {w}: NO delta match (best {frac:.2f}) "
                              "— samples left unmarked")
                continue
            sha, d = m
            win_delta[w] = d
            open_flags = d.get("open_flags")
            if open_flags is None:
                # pre-r16 artifact: flags had no in-capture adjudication,
                # so every flag was unresolved at capture time
                open_flags = d.get("flagged", [])
                tag = "flagged (pre-open_flags artifact)"
            else:
                tag = "open_flags"
            for q in open_flags:
                if q in windows[w]:
                    win_contested.setdefault(w, {})[q] = (
                        f"flag on this query was still open when this "
                        f"window was captured ({tag} in the delta committed "
                        f"at {sha}) — excluded from envelope bounds")
            report.append(f"{sf} {w}: delta {sha} (match {frac:.2f}), "
                          f"contested: {sorted(win_contested.get(w, {}))}")
        # phase 2: fixpoint — invalidate envelope-drift closures whose
        # cited bound rested on a now-contested sample
        changed = True
        while changed:
            changed = False
            for w in sorted(windows):
                d = win_delta.get(w)
                if d is None:
                    continue
                adj = d.get("auto_adjudication") or {}
                for q, r in adj.items():
                    if q not in windows[w]:
                        continue
                    if q in win_contested.get(w, {}):
                        continue
                    if not str(r.get("verdict", "")).startswith(
                            "envelope-drift"):
                        continue
                    fp = (r.get("envelope") or {}).get("fp")
                    prior = [e for q2, es in
                             [(q, bucket.get(q, []))] for e in es
                             if e["window"] < w and e.get("fp") == fp
                             and e.get("spark_min", 0) > 0
                             and q not in win_contested.get(e["window"], {})]
                    iso = r.get("isolated_min") or r.get("ab_min")
                    hi = max((e["spark_min"] for e in prior), default=None)
                    if len(prior) < 3 or iso is None or iso > hi:
                        win_contested.setdefault(w, {})[q] = (
                            "flag auto-closed as envelope-drift against a "
                            "bound that included contested samples; under "
                            "the contested-excluded envelope "
                            + (f"[hi {hi:.3f}] the isolated min {iso:.3f} "
                               "stays outside" if prior and hi is not None
                               and iso is not None else
                               "fewer than 3 clean windows remain")
                            + " — closure invalidated, sample inherits the "
                            "contest (r18 fixpoint)")
                        report.append(f"{sf} {w}: {q} envelope-drift "
                                      f"closure INVALIDATED (iso {iso}, "
                                      f"clean hi {hi})")
                        changed = True
        # apply: recompute markers for windows whose delta was matched;
        # windows with NO committed delta (intermediate captures) keep
        # whatever marks the live capture itself wrote — re-running this
        # script must never erase a capture's own contested record
        for q, entries in bucket.items():
            if q.startswith("_"):
                continue
            for e in entries:
                if e["window"] not in win_delta:
                    continue
                reason = win_contested.get(e["window"], {}).get(q)
                if reason is not None:
                    e["contested"] = reason
                else:
                    e.pop("contested", None)
        # backfill the suite envelope (r18, verdict Missing #2): each
        # window's totals + fingerprint-set hash reconstructed from its
        # per-query samples (every capture appends all queries, so the
        # reconstruction equals what the capture reported), then the suite
        # rule replayed chronologically so a retroactively-inflated window
        # (the r17 61.8 s driver window) is contested from the start
        import bench_ab
        # pre-r18 captures rendered typed-closure plans with per-JVM lambda
        # addresses, so these four queries' historical fps are unique per
        # window (fixed in Bench.scrubbedPlan r18). Backfilled fpsets hash
        # the OTHER queries and carry a legacy- prefix: they attest
        # same-code within history honestly but deliberately never match a
        # live capture's full-set hash — live windows accumulate their own.
        legacy_unstable = {"q54_multimodal_decode", "q74_pack_sequences",
                           "q94_frame_sample", "q95_multimodal_resize"}
        # live _suite entries (appended by post-r18 captures with FULL-set
        # fpsets and in-capture verdicts) are authoritative — the backfill
        # only reconstructs windows that predate the live mechanism, so
        # re-running this script never clobbers a capture's own record
        live_suite = {e["window"]: e for e in bucket.get("_suite", [])
                      if not str(e.get("fpset", "")).startswith("legacy-")}
        suite_entries = []
        for w in sorted(windows):
            if w in live_suite:
                suite_entries.append(live_suite[w])
                continue
            qs = {q: e for q, e in windows[w].items()
                  if not q.startswith("_")}
            fps = {q: e.get("fp", "unknown") for q, e in qs.items()
                   if q not in legacy_unstable}
            s_tot = round(sum(e["spark_min"] for e in qs.values()), 3)
            d_tot = round(sum(e["duckdb_min"] for e in qs.values()
                              if isinstance(e.get("duckdb_min"), float)
                              and e["duckdb_min"] > 0), 3)
            entry = {"window": w, "spark_total": s_tot,
                     "duckdb_total": d_tot,
                     "fpset": "legacy-" + bench_ab.suite_fpset(fps)}
            prior = [e for e in suite_entries
                     if e["fpset"] == entry["fpset"]
                     and not e.get("contested")]
            if len(prior) >= 3:
                hi = max(e["spark_total"] for e in prior)
                ducks = [e["duckdb_total"] for e in prior
                         if e["duckdb_total"] > 0]
                med = sorted(ducks)[len(ducks) // 2] if ducks else None
                duck_stable = (med is not None and d_tot > 0
                               and med / 1.1 <= d_tot <= 1.1 * med)
                if s_tot > hi and duck_stable:
                    entry["contested"] = (
                        "retroactive suite-inflation (backfill): spark "
                        f"total {s_tot:.1f}s outside the prior same-fpset "
                        f"envelope hi {hi:.1f}s with the DuckDB side "
                        "stable — excluded from suite envelope bounds")
                    report.append(f"{sf} {w}: _suite RETRO-INFLATION "
                                  f"(spark {s_tot:.1f} > hi {hi:.1f}, "
                                  f"duck {d_tot:.1f} vs med {med:.1f})")
            suite_entries.append(entry)
        bucket["_suite"] = suite_entries[-10:]
    with open(ENVELOPE_PATH, "w") as f:
        json.dump(env, f, indent=1, sort_keys=True)
        f.write("\n")
    for line in report:
        print(line)
    # summary of the resulting bounds for the verdict's named case
    q107 = env["per_sf"].get("sf0.1", {}).get("q107_incremental_agg", [])
    clean = [e["spark_min"] for e in q107 if not e.get("contested")]
    if clean:
        print(f"\nq107 contested-excluded envelope: "
              f"[{min(clean):.3f}-{max(clean):.3f}] over {len(clean)} "
              f"windows ({len(q107) - len(clean)} contested)")


if __name__ == "__main__":
    main()
