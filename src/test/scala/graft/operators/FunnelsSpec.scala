package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class FunnelsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def evOf(rows: (Long, Long, String, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("user_id", "ts_us", "event_type", "event_id")
  }
  private def stages(rows: (Long, Long, String, Long)*): Map[Long, Int] =
    Funnels.funnelStages(evOf(rows: _*), "user_id", "ts_us", "event_type",
        "event_id", Seq("view", "click", "purchase"), windowUs = 100L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("full conversion, strict order, window respected") {
    val s = stages(
      (1L, 10L, "view", 1L), (1L, 50L, "click", 2L), (1L, 120L, "purchase", 3L),
      (2L, 10L, "view", 4L), (2L, 200L, "click", 5L), // click outside window
      (3L, 10L, "click", 6L), (3L, 20L, "view", 7L))  // click BEFORE view: no advance
    assert(s == Map(1L -> 3, 2L -> 1, 3L -> 1))
  }

  test("equal-timestamp tie does not advance (strict >)") {
    val s = stages((1L, 10L, "view", 1L), (1L, 10L, "click", 2L))
    assert(s(1L) == 1)
  }

  test("greedy anchor: first view is the anchor even when a later view would convert") {
    // view@10 (no click within 100), view@500, click@510: the greedy walk
    // anchored at ts=10 never re-anchors — stage stays 1. This IS the
    // declared min-chain contract (t2 = min click in (v, v+W] of the FIRST
    // view), which the oracle mirrors.
    val s = stages((1L, 10L, "view", 1L), (1L, 500L, "view", 2L), (1L, 510L, "click", 3L))
    assert(s(1L) == 1)
  }

  test("a user with no step-0 event sits at stage 0") {
    val s = stages((1L, 10L, "click", 1L), (1L, 20L, "purchase", 2L))
    assert(s(1L) == 0)
  }

  test("includeStepless folds step-less entities in at stage 0, nulls excluded") {
    val s = spark
    import s.implicits._
    // A converts one step, B has ONLY non-step events, null has a step event
    val ev = Seq(
      (Some(1L), 10L, "view", 1L),
      (Some(2L), 10L, "signup", 2L),
      (Option.empty[Long], 10L, "view", 3L))
      .toDF("user_id", "ts_us", "event_type", "event_id")
    def run(flag: Boolean) =
      Funnels.funnelStages(ev, "user_id", "ts_us", "event_type", "event_id",
          Seq("view", "click", "purchase"), windowUs = 100L, includeStepless = flag)
        .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getInt(1)).toMap
    // default: only entities with >=1 step event (the walk's null group kept as before)
    assert(run(false) == Map(1L -> 1, -1L -> 1))
    // flag: B appears at stage 0; no phantom extra null row is added
    assert(run(true) == Map(1L -> 1, 2L -> 0, -1L -> 1))
  }
}
