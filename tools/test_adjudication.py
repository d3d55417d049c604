#!/usr/bin/env python3
"""Regression tests for the adjudication machinery (r18).

Run: python3 tools/test_adjudication.py

Pins the two r17-verdict defects at the exact histories that exposed them:

1. ENVELOPE CIRCULARITY (What's-wrong #1): the committed q107 history —
   the r16 12:04 window's 0.752 s wall was an OPEN flag when captured, so
   it is contested and must not serve as the bound that exonerates the
   r17 final-capture recurrence (isolated min 0.741 s). With contested
   samples excluded the envelope is [0.448-0.596] and the flag stays on
   the isolated-min path instead of self-closing.

2. FP-GATED WINDOW-DRIFT CLOSE (Missing #4): bench_sf1's floor-class
   self-close must stay OPEN (UNCONFIRMED) whenever the scrubbed-plan
   fingerprint changed or is missing on either side — only an unchanged
   fingerprint (or a pre-fingerprint baseline, the documented transition)
   closes.
"""
import json
import os
import sys
import tempfile
import unittest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_ab  # noqa: E402
import bench_sf1  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_envelope(path, sf, query, samples):
    """samples: list of (spark_min, duckdb_min, fp, contested_or_None)."""
    entries = []
    for i, (s, d, fp, c) in enumerate(samples):
        e = {"window": f"2026-08-16T{10 + i:02d}:00:00@abc{i}",
             "spark_min": s, "duckdb_min": d, "fp": fp}
        if c:
            e["contested"] = c
        entries.append(e)
    with open(path, "w") as f:
        json.dump({"per_sf": {sf: {query: entries}}}, f)


class EnvelopeContested(unittest.TestCase):
    def setUp(self):
        self._orig = bench_ab.ENVELOPE_PATH
        self.tmp = tempfile.NamedTemporaryFile(
            mode="w", suffix=".json", delete=False)
        self.tmp.close()
        bench_ab.ENVELOPE_PATH = self.tmp.name

    def tearDown(self):
        bench_ab.ENVELOPE_PATH = self._orig
        os.unlink(self.tmp.name)

    def _adjudicate(self, iso, duck=0.033):
        rows = {"q": {"verdict": "regression (exceeds same-window band)",
                      "isolated_min": iso, "ab_min": iso,
                      "duckdb_min": duck}}
        per = {"q": {"plan_fp": "fp1"}}
        bench_ab.apply_envelope_rule(rows, per, "/data/sf0.1")
        return rows["q"]

    def test_contested_sample_cannot_exonerate(self):
        # clean hi 0.596; a contested 0.752 present — iso 0.741 must stay
        # open (under the pre-r18 rule hi would be 0.752 and it would
        # self-close as envelope-drift)
        synth_envelope(self.tmp.name, "sf0.1", "q", [
            (0.448, 0.032, "fp1", None),
            (0.478, 0.031, "fp1", None),
            (0.502, 0.034, "fp1", None),
            (0.596, 0.042, "fp1", None),
            (0.752, 0.040, "fp1", "flag open at capture"),
        ])
        r = self._adjudicate(0.741)
        self.assertTrue(r["verdict"].startswith("regression"), r["verdict"])
        self.assertEqual(r["envelope"]["contested_excluded"], 1)
        self.assertAlmostEqual(r["envelope"]["spark_hi"], 0.596)

    def test_clean_drift_still_closes(self):
        # the legitimate path is untouched: iso inside the clean bounds
        # with a stable DuckDB side closes as envelope-drift
        synth_envelope(self.tmp.name, "sf0.1", "q", [
            (0.448, 0.032, "fp1", None),
            (0.478, 0.031, "fp1", None),
            (0.596, 0.034, "fp1", None),
            (0.752, 0.040, "fp1", "flag open at capture"),
        ])
        r = self._adjudicate(0.590)
        self.assertTrue(r["verdict"].startswith("envelope-drift"),
                        r["verdict"])

    def test_too_few_clean_windows(self):
        # contested exclusion can starve the rule below 3 windows — it
        # must decline to apply, not fall back to contested bounds
        synth_envelope(self.tmp.name, "sf0.1", "q", [
            (0.448, 0.032, "fp1", None),
            (0.478, 0.031, "fp1", None),
            (0.752, 0.040, "fp1", "flag open at capture"),
            (0.760, 0.041, "fp1", "flag open at capture"),
        ])
        r = self._adjudicate(0.741)
        self.assertTrue(r["verdict"].startswith("regression"))
        self.assertFalse(r["envelope"]["applies"])
        self.assertEqual(r["envelope"]["contested_excluded"], 2)

    def test_record_envelope_marks_open_flags(self):
        os.unlink(self.tmp.name)  # start from no envelope file
        per = {"qa": {"spark_min": 0.5, "duckdb_min": 0.03, "plan_fp": "f"},
               "qb": {"spark_min": 0.7, "duckdb_min": 0.04, "plan_fp": "g"}}
        env = bench_ab.record_envelope("/data/sf0.1", per, contested={"qb"})
        bucket = env["per_sf"]["sf0.1"]
        self.assertNotIn("contested", bucket["qa"][0])
        self.assertIn("contested", bucket["qb"][0])


class Q107CommittedHistory(unittest.TestCase):
    """The r17 final-capture q107 flag, replayed against the committed
    (re-derived) BENCH_ENVELOPE.json: it must now take the isolated-min
    path (stay open at the envelope step) instead of self-closing against
    the contested 0.752 bound."""

    # the committed q107 history as of the r17 final capture, verbatim
    # from the re-derived BENCH_ENVELOPE.json (commit 163ea1d). Frozen
    # here as a fixture because the live envelope keeps only the last 10
    # windows per query — normal post-r18 captures age these samples out,
    # and a regression test on a historical moment must not depend on
    # retention.
    R17_FP = "523a8332bf67df31"
    R17_HISTORY = [
        ("2026-08-15T21:32:51@154e134", 0.570065, 0.031615, None),
        ("2026-08-16T06:40:56@f2aa3f5", 0.447942, 0.032644, None),
        ("2026-08-16T08:50:58@2b50128", 0.478130, 0.030669, None),
        ("2026-08-16T09:40:28@97ff426", 0.502358, 0.034155, None),
        ("2026-08-16T09:53:35@97ff426", 0.493876, 0.032096, None),
        ("2026-08-16T11:01:58@c000eed", 0.596156, 0.042525, None),
        ("2026-08-16T11:15:00@c000eed", 0.464243, 0.033300, None),
        ("2026-08-16T12:04:22@775c769", 0.752310, 0.040212,
         "flag open at capture (open_flags in the delta committed at "
         "4177857)"),
        ("2026-08-16T13:37:18@f5e88c3", 0.470833, 0.033343, None),
    ]

    def test_r17_final_capture_flag_stays_open_at_envelope_step(self):
        entries = [dict(window=w, spark_min=s, duckdb_min=d, fp=self.R17_FP,
                        **({"contested": c} if c else {}))
                   for (w, s, d, c) in self.R17_HISTORY]
        tmp = tempfile.NamedTemporaryFile(
            mode="w", suffix=".json", delete=False)
        json.dump({"per_sf": {"sf0.1": {"q107_incremental_agg": entries}}},
                  tmp)
        tmp.close()
        orig = bench_ab.ENVELOPE_PATH
        bench_ab.ENVELOPE_PATH = tmp.name
        try:
            # the r17 delta's recorded adjudication inputs (012cb66)
            rows = {"q107_incremental_agg": {
                "verdict": "regression (exceeds same-window band)",
                "isolated_min": 0.741232, "ab_min": 0.719026,
                "duckdb_min": 0.03852}}
            per = {"q107_incremental_agg": {"plan_fp": self.R17_FP}}
            bench_ab.apply_envelope_rule(rows, per, "/data/sf0.1")
        finally:
            bench_ab.ENVELOPE_PATH = orig
            os.unlink(tmp.name)
        r = rows["q107_incremental_agg"]
        self.assertTrue(r["verdict"].startswith("regression"), r["verdict"])
        self.assertLessEqual(r["envelope"]["spark_hi"], 0.60)
        self.assertGreaterEqual(r["envelope"]["contested_excluded"], 1)

    def test_live_envelope_keeps_contested_mark_while_sample_survives(self):
        # retention-tolerant live check: IF the r16 12:04 q107 sample is
        # still inside the keep-10 window, it must still carry its mark
        env = json.load(open(f"{REPO}/BENCH_ENVELOPE.json"))
        entries = env["per_sf"]["sf0.1"]["q107_incremental_agg"]
        for e in entries:
            if abs(e["spark_min"] - 0.75231) < 1e-6:
                self.assertIn("contested", e)


class SuiteDriftGate(unittest.TestCase):
    """The r17 signature: a 16% Spark-side-only suite inflation (53.2 ->
    61.8 s at sf0.1, DuckDB flat at ~20.3 s) must flag mechanically."""

    def setUp(self):
        self._orig = bench_ab.ENVELOPE_PATH
        self.tmp = tempfile.NamedTemporaryFile(
            mode="w", suffix=".json", delete=False)
        self.tmp.close()
        bench_ab.ENVELOPE_PATH = self.tmp.name
        self.per = {"q01": {"spark_min": 1.0, "duckdb_min": 0.5,
                            "plan_fp": "f1"},
                    "q02": {"spark_min": 2.0, "duckdb_min": 0.7,
                            "plan_fp": "f2"}}
        self.fpset = bench_ab.suite_fpset({"q01": "f1", "q02": "f2"})

    def tearDown(self):
        bench_ab.ENVELOPE_PATH = self._orig
        if os.path.exists(self.tmp.name):
            os.unlink(self.tmp.name)

    def _suite_env(self, samples):
        entries = []
        for i, (s, d, c) in enumerate(samples):
            e = {"window": f"2026-08-16T{10 + i:02d}:00:00@abc{i}",
                 "spark_total": s, "duckdb_total": d, "fpset": self.fpset}
            if c:
                e["contested"] = c
            entries.append(e)
        with open(self.tmp.name, "w") as f:
            json.dump({"per_sf": {"sf0.1": {"_suite": entries}}}, f)

    def test_r17_style_inflation_flags(self):
        self._suite_env([(53.2, 20.2, None), (55.0, 20.4, None),
                         (58.6, 20.4, None)])
        out = bench_ab.apply_suite_rule("/data/sf0.1", self.per, 61.8, 20.6)
        self.assertTrue(out["verdict"].startswith("suite-inflation"),
                        out["verdict"])
        self.assertTrue(out.get("open"))

    def test_inside_envelope_ok(self):
        self._suite_env([(53.2, 20.2, None), (55.0, 20.4, None),
                         (58.6, 20.4, None)])
        out = bench_ab.apply_suite_rule("/data/sf0.1", self.per, 56.0, 20.6)
        self.assertTrue(out["verdict"].startswith("suite-ok"), out["verdict"])
        self.assertFalse(out.get("open", False))

    def test_both_engines_moved_is_host_phase(self):
        self._suite_env([(53.2, 20.2, None), (55.0, 20.4, None),
                         (58.6, 20.4, None)])
        out = bench_ab.apply_suite_rule("/data/sf0.1", self.per, 70.0, 27.0)
        self.assertTrue(out["verdict"].startswith("suite-moved-both-engines"),
                        out["verdict"])

    def test_contested_sample_excluded_from_suite_bounds(self):
        # an inflated-but-contested 61.8 must not raise hi for the next one
        self._suite_env([(53.2, 20.2, None), (55.0, 20.4, None),
                         (58.6, 20.4, None),
                         (61.8, 20.6, "suite-inflation open")])
        out = bench_ab.apply_suite_rule("/data/sf0.1", self.per, 61.0, 20.5)
        self.assertTrue(out["verdict"].startswith("suite-inflation"),
                        out["verdict"])
        self.assertEqual(out["contested_excluded"], 1)
        self.assertAlmostEqual(out["spark_hi"], 58.6)

    def test_fewer_than_three_windows_no_gate(self):
        self._suite_env([(53.2, 20.2, None), (55.0, 20.4, None)])
        out = bench_ab.apply_suite_rule("/data/sf0.1", self.per, 61.8, 20.6)
        self.assertTrue(out["verdict"].startswith("no-envelope"))

    def test_record_envelope_appends_and_contests_suite(self):
        os.unlink(self.tmp.name)
        suite = {"spark_total": 61.8, "duckdb_total": 20.6,
                 "fpset": self.fpset, "open": True,
                 "verdict": "suite-inflation (...)"}
        env = bench_ab.record_envelope("/data/sf0.1", self.per, suite=suite)
        e = env["per_sf"]["sf0.1"]["_suite"][0]
        self.assertEqual(e["spark_total"], 61.8)
        self.assertIn("contested", e)

    def test_suite_inflation_contests_all_per_query_samples(self):
        # r19 (advice, medium): an inflated window's individually-in-band
        # per-query samples must not enter per-query bounds clean — ALL of
        # the window's samples inherit the suite-level contest
        os.unlink(self.tmp.name)
        suite = {"spark_total": 61.8, "duckdb_total": 20.6,
                 "fpset": self.fpset, "open": True,
                 "verdict": "suite-inflation (...)"}
        env = bench_ab.record_envelope("/data/sf0.1", self.per, suite=suite)
        bucket = env["per_sf"]["sf0.1"]
        for q in ("q01", "q02"):
            self.assertIn("contested", bucket[q][0], q)
            self.assertIn("suite-inflation", bucket[q][0]["contested"])

    def test_suite_moved_both_contests_all_per_query_samples(self):
        # same rule through the both-engines door: phase-elevated per-query
        # walls must not widen per-query spark_hi (the r18 second ratchet,
        # applied per-query)
        os.unlink(self.tmp.name)
        suite = {"spark_total": 70.0, "duckdb_total": 27.0,
                 "fpset": self.fpset,
                 "verdict": "suite-moved-both-engines (...)"}
        env = bench_ab.record_envelope("/data/sf0.1", self.per, suite=suite)
        bucket = env["per_sf"]["sf0.1"]
        for q in ("q01", "q02"):
            self.assertIn("contested", bucket[q][0], q)
            self.assertIn("host phase", bucket[q][0]["contested"])

    def test_suite_ok_window_stays_clean_per_query(self):
        os.unlink(self.tmp.name)
        suite = {"spark_total": 55.0, "duckdb_total": 20.4,
                 "fpset": self.fpset, "verdict": "suite-ok (...)"}
        env = bench_ab.record_envelope("/data/sf0.1", self.per, suite=suite)
        bucket = env["per_sf"]["sf0.1"]
        for q in ("q01", "q02"):
            self.assertNotIn("contested", bucket[q][0], q)


class CleanRetention(unittest.TestCase):
    """r19 (verdict Missing #1): retention keeps the last ENVELOPE_KEEP
    CLEAN samples — a phase that contests every window must never age the
    clean pool out and leave the gates blind (r18's closing capture read
    no-envelope after the evening phase contested 8 of 10 windows)."""

    def setUp(self):
        self._orig = bench_ab.ENVELOPE_PATH
        self.tmp = tempfile.NamedTemporaryFile(
            mode="w", suffix=".json", delete=False)
        self.tmp.close()
        bench_ab.ENVELOPE_PATH = self.tmp.name

    def tearDown(self):
        bench_ab.ENVELOPE_PATH = self._orig
        if os.path.exists(self.tmp.name):
            os.unlink(self.tmp.name)

    def test_trim_keeps_clean_and_contested_pools_separately(self):
        entries = ([{"window": f"w{i:02d}", "spark_min": 1.0}
                    for i in range(12)]
                   + [{"window": f"w{i:02d}", "spark_min": 2.0,
                       "contested": "phase"} for i in range(12, 27)])
        bench_ab.trim_retention(entries)
        clean = [e for e in entries if not e.get("contested")]
        cont = [e for e in entries if e.get("contested")]
        self.assertEqual(len(clean), bench_ab.ENVELOPE_KEEP)
        self.assertEqual(len(cont), bench_ab.ENVELOPE_KEEP)
        # newest of each pool survive
        self.assertEqual(clean[-1]["window"], "w11")
        self.assertEqual(cont[-1]["window"], "w26")

    def test_phase_heavy_history_still_lets_suite_gate_rule(self):
        # 3 clean windows, then a long phase appends 9 contested windows:
        # under keep-10-total the clean pool would be down to 1 and the
        # gate blind; under clean retention it must still rule
        per = {"q01": {"spark_min": 1.0, "duckdb_min": 0.5,
                       "plan_fp": "f1"}}
        fpset = bench_ab.suite_fpset({"q01": "f1"})
        os.unlink(self.tmp.name)
        for s in (53.2, 55.0, 54.1):
            bench_ab.record_envelope(
                "/data/sf0.1", per,
                suite={"spark_total": s, "duckdb_total": 20.3,
                       "fpset": fpset, "verdict": "suite-ok (...)"})
        for i in range(9):
            bench_ab.record_envelope(
                "/data/sf0.1", per,
                suite={"spark_total": 65.0 + i, "duckdb_total": 26.0,
                       "fpset": fpset,
                       "verdict": "suite-moved-both-engines (...)"})
        out = bench_ab.apply_suite_rule("/data/sf0.1", per, 54.5, 20.4)
        self.assertTrue(out["verdict"].startswith("suite-ok"),
                        out["verdict"])
        self.assertEqual(out["same_fpset_windows"], 3)
        self.assertEqual(out["contested_excluded"], 9)


class FloorDriftFingerprintGate(unittest.TestCase):
    def test_unchanged_fingerprint_closes(self):
        v, is_open = bench_sf1.floor_drift_verdict(0.44, "fpX", "fpX", True)
        self.assertFalse(is_open)
        self.assertIn("plan fingerprint unchanged", v)

    def test_changed_fingerprint_stays_open(self):
        v, is_open = bench_sf1.floor_drift_verdict(0.44, "fpX", "fpY", True)
        self.assertTrue(is_open)
        self.assertIn("UNCONFIRMED", v)
        self.assertIn("CHANGED", v)

    def test_fp_missing_from_baseline_stays_open(self):
        v, is_open = bench_sf1.floor_drift_verdict(0.44, None, "fpY", True)
        self.assertTrue(is_open)
        self.assertIn("missing from the baseline", v)

    def test_fp_missing_from_capture_stays_open(self):
        # ADVICE r17: BenchSf1 swallows fingerprint exceptions, so the
        # CURRENT capture's fp can be None — that is not 'CHANGED'
        v, is_open = bench_sf1.floor_drift_verdict(0.44, "fpX", None, True)
        self.assertTrue(is_open)
        self.assertIn("missing from this capture", v)
        self.assertNotIn("CHANGED", v)

    def test_pre_fingerprint_baseline_transition_close(self):
        v, is_open = bench_sf1.floor_drift_verdict(0.44, None, "fpY", False)
        self.assertFalse(is_open)
        self.assertIn("pre-r17 artifact", v)


if __name__ == "__main__":
    unittest.main(verbosity=2)
