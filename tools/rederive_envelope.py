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
     a contested bound, so the sample inherits the contest, or
  3. WINDOW-WIDE (r19): the window's SUITE sample is contested as a
     systematic shift (suite-inflation, both-engines host phase, or
     retro-inflation) — every per-query sample of that window inherits
     the contest, mirroring the live record_envelope rule, so a phase
     window's individually-in-band walls never widen per-query spark_hi.

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
import statistics
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
        # phase 1b: backfill the suite envelope (r18, verdict Missing #2),
        # hoisted BEFORE the fixpoint since r19 — a window whose suite
        # sample is contested as systematically shifted (suite-inflation,
        # both-engines host phase, retro-inflation) has ALL its per-query
        # samples inherit the contest (the live record_envelope rule,
        # applied to history: the r18 evening phase left per-query walls —
        # e.g. a 1.993 s q107 peak — sitting clean inside per-query
        # bounds, the exact spark_hi ratchet the live rule closes), and
        # the phase-2 fixpoint must re-judge drift closures against the
        # properly clean bounds. More specific per-query marks (an open
        # flag at capture) win over the inherited window-wide reason.
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
        def retro_inflated(entry, prior_pool):
            """(hi, med) when the entry lies above the ≥3-clean-prior
            same-fpset envelope with a stable DuckDB side — the live
            apply_suite_rule's inflation test, replayed under the
            corrected history. None = no ruling possible or in band."""
            prior = [e for e in prior_pool
                     if e["fpset"] == entry["fpset"]
                     and not e.get("contested")]
            if len(prior) < 3:
                return None
            hi = max(e["spark_total"] for e in prior)
            ducks = [e["duckdb_total"] for e in prior
                     if e["duckdb_total"] > 0]
            med = statistics.median(ducks) if ducks else None
            d_tot = entry.get("duckdb_total") or 0
            if (med is None or d_tot <= 0
                    or not (med / 1.1 <= d_tot <= 1.1 * med)):
                return None
            return (hi, med) if entry["spark_total"] > hi else None

        suite_entries = []
        for w in sorted(windows):
            if w in live_suite:
                entry = live_suite[w]
                # a live capture's own contest is never erased, but a CLEAN
                # live entry is re-judged under the corrected history: its
                # capture may have ruled suite-ok against phase-polluted
                # bounds, or been unable to rule at all (no-envelope at
                # capture enters clean by ignorance, not by ruling) — the
                # same inflation test the backfill applies to legacy
                # windows (r19)
                if not entry.get("contested"):
                    rj = retro_inflated(entry, suite_entries)
                    if rj is not None:
                        hi, med = rj
                        entry["contested"] = (
                            "retroactive suite-inflation (re-derived under "
                            f"corrected history): spark total "
                            f"{entry['spark_total']:.1f}s outside the "
                            f"contested-excluded same-fpset envelope hi "
                            f"{hi:.1f}s with the DuckDB side stable — "
                            "excluded from suite envelope bounds")
                        report.append(
                            f"{sf} {w}: _suite LIVE RETRO-INFLATION "
                            f"(spark {entry['spark_total']:.1f} > hi "
                            f"{hi:.1f}, duck med {med:.1f})")
                suite_entries.append(entry)
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
            # statistics.median inside retro_inflated, NOT the upper-middle
            # element: the live apply_suite_rule uses statistics.median,
            # and with the tight 1.1x band a borderline even-n window must
            # classify identically in replayed history and live capture
            rj = retro_inflated(entry, suite_entries)
            if rj is not None:
                hi, med = rj
                entry["contested"] = (
                    "retroactive suite-inflation (backfill): spark "
                    f"total {s_tot:.1f}s outside the prior same-fpset "
                    f"envelope hi {hi:.1f}s with the DuckDB side "
                    "stable — excluded from suite envelope bounds")
                report.append(f"{sf} {w}: _suite RETRO-INFLATION "
                              f"(spark {s_tot:.1f} > hi {hi:.1f}, "
                              f"duck {d_tot:.1f} vs med {med:.1f})")
            suite_entries.append(entry)
        # every contested suite reason in the ledger's vocabulary denotes a
        # window-level shift (inflation / host phase / moved-both /
        # retro-applied elevation), so any suite contest spreads
        shifted = {e["window"]: e["contested"] for e in suite_entries
                   if e.get("contested")
                   and ("inflation" in e["contested"]
                        or "host phase" in e["contested"]
                        or "both-engines" in e["contested"]
                        or "moved-both" in e["contested"]
                        or "elevation" in e["contested"])}
        for w, reason in shifted.items():
            if w not in windows:
                continue
            for q in windows[w]:
                if q in win_contested.get(w, {}):
                    continue
                win_contested.setdefault(w, {})[q] = (
                    "window's suite sample is contested as a systematic "
                    "shift — per-query sample inherits the contest (r19 "
                    "window-wide rule applied to history): "
                    + reason.split(" — ")[0])
            report.append(f"{sf} {w}: ALL per-query samples inherit the "
                          "suite contest")
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
                    # samples from windows with NO matched delta carry the
                    # live capture's own contested mark — phase 1 cannot
                    # recompute it, but the bound-validity test must still
                    # respect it (r19 advice: a live-contested sample must
                    # not serve as the bound that validates a drift closure)
                    prior = [e for q2, es in
                             [(q, bucket.get(q, []))] for e in es
                             if e["window"] < w and e.get("fp") == fp
                             and e.get("spark_min", 0) > 0
                             and q not in win_contested.get(e["window"], {})
                             and not (e["window"] not in win_delta
                                      and e.get("contested"))]
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
        # script must never erase a capture's own contested record — but a
        # window-wide suite contest (phase 1b) still lands on their
        # unmarked samples. Clean retention (r19) is re-applied per query.
        for q, entries in bucket.items():
            if q.startswith("_"):
                continue
            for e in entries:
                reason = win_contested.get(e["window"], {}).get(q)
                if e["window"] in win_delta:
                    if reason is not None:
                        e["contested"] = reason
                    else:
                        e.pop("contested", None)
                elif reason is not None and not e.get("contested"):
                    e["contested"] = reason
            bench_ab.trim_retention(entries)
        # clean-sample retention (r19): same rule as the live capture —
        # contested provenance must never age the clean pool out
        bench_ab.trim_retention(suite_entries)
        bucket["_suite"] = suite_entries
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
