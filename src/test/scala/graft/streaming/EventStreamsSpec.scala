package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q125/q130 timer-clamp margin: no session close in the final watermark's last ms") {
    // Both sessionizers clamp their close timer to watermark+1 ms (Spark
    // rejects event-time timeouts ≤ the current watermark). A clamped timer
    // fires only once the watermark advances ≥2 ms past the clamp point, so
    // the ONLY input that can diverge from the strict-µs oracle is a
    // session whose close (end+gap µs) lands inside the final watermark's
    // last millisecond — emission required (close < wm_final·1000) but a
    // worst-case clamped timer (registered at wm_final−1+1 = wm_final)
    // cannot fire in the trailing no-data batch. Closes BELOW that window
    // are emitted inline or by a firing timer; closes at/above it are not
    // emitted by the oracle either. Assert the window is empty at every SF,
    // so a regenerated fixture that lands a close there fails HERE instead
    // of flaking the streaming certification.
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    val gapUs = 30L * 60 * 1000000
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val ev = Tables(spark, s"/root/testdata/$sf").eventsUs
        .select(col("user_id"), col("ts_us"))
      val wmFinalMs = ev.agg(max(col("ts_us"))).head().getLong(0) / 1000 - 600000
      val w = W.partitionBy("user_id").orderBy("ts_us")
      val closes = ev
        .withColumn("brk",
          when(lag("ts_us", 1).over(w).isNull
            || col("ts_us") - lag("ts_us", 1).over(w) > gapUs, 1).otherwise(0))
        .withColumn("sid", sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("user_id", "sid").agg((max("ts_us") + gapUs).as("close_us"))
      val inWindow = closes
        .filter(col("close_us") >= (wmFinalMs - 1) * 1000L &&
          col("close_us") < wmFinalMs * 1000L)
        .count()
      assert(inWindow == 0L,
        s"$sf: $inWindow session closes land in the final watermark's last " +
          "ms — the wm+1 timer clamp could defer them past the trailing " +
          "no-data batch and diverge from the strict-µs oracle")
    }
  }

  test("B31: streaming tumbling counts equal the batch equivalent") {
    val t = Tables(spark, TestSpark.Sf0001)
    val streamed = EventStreams.tumblingCounts(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val batch = t.eventsUs
      .groupBy((expr("ts_us div 3600000000") * 3600000000L).as("bucket_us"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket_us", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(streamed == batch)
  }

  test("B33: streaming session counts equal the batch gap-island identity") {
    val streamed = EventStreams.sessionCounts(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // batch identity: new session when gap >= 30min (session window is
    // [start, last+gap), so an event exactly at the boundary starts a new one)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val batch = Tables(spark, TestSpark.Sf0001).eventsUs
      .withColumn("prev", lag("ts_us", 1).over(w))
      .withColumn("ns", when(col("prev").isNull || col("ts_us") - col("prev") >= 1800000000L, 1L).otherwise(0L))
      .groupBy("user_id").agg(sum("ns").as("n"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed == batch)
  }

  test("B32: late events beyond the watermark are dropped in append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val agg = mem.toDF().toDF("ts_utc", "k")
      .withWatermark("ts_utc", "10 minutes")
      .groupBy(window(col("ts_utc"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w"), col("k"), col("cnt"))
    val name = s"graft_late_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(name).outputMode("append").start()
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // batch 1: two on-time events in hour 10
    mem.addData((ts(10, 5), "a"), (ts(10, 10), "a"))
    q.processAllAvailable()
    // batch 2: advance event time to 13:00 → watermark 12:50, hour-10 window closes
    mem.addData((ts(13, 0), "a"))
    q.processAllAvailable()
    // batch 3: a LATE event for hour 10 (way below watermark) must be dropped
    mem.addData((ts(10, 20), "a"))
    q.processAllAvailable()
    // batch 4: push watermark past hour 13 so its window also emits
    mem.addData((ts(15, 0), "a"))
    q.processAllAvailable()
    q.stop()
    val out = s.table(name).collect()
      .map(r => (r.getTimestamp(0), r.getLong(2))).toMap
    assert(out(ts(10, 0)) == 2L, s"hour-10 window must count only on-time events: $out")
  }

  test("q125 protocol: sessions close mid-stream on watermark advance and state evicts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val src = mem.toDF().toDF("user_id", "ts_utc")
      .withColumn("ts_us", unix_micros(col("ts_utc")))
    val name = s"graft_sess_${System.nanoTime()}"
    val q = EventStreams.gapSessionsFrom(src)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    def us(h: Int, m: Int) = ts(h, m).getTime * 1000L
    def emitted() = s.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch 1: user 1 has two sessions (10:00+10:10, then 11:30 after a
    // >30min gap). The data batch runs with no watermark, then the trailing
    // no-data batch runs under wm = 11:30-10min = 11:20, which strictly
    // passed session 1's closure (10:10+30min = 10:40) → session 1 emits
    // via TIMEOUT; session 2 (closure 12:00) stays open.
    mem.addData((1L, ts(10, 0)), (1L, ts(10, 10)), (1L, ts(11, 30)))
    q.processAllAvailable()
    assert(emitted() == Set((1L, us(10, 0), us(10, 10), 2L)),
      s"batch-1 emissions: ${emitted()}")
    // batch 2: user 2 arrives at 13:00 → wm advances to 12:50 → user 1's
    // second session (closure 12:00) emits via timeout and user 1's state
    // is REMOVED; user 2's open session (closure 13:30) is retained.
    mem.addData((2L, ts(13, 0)))
    q.processAllAvailable()
    assert(emitted() == Set(
      (1L, us(10, 0), us(10, 10), 2L),
      (1L, us(11, 30), us(11, 30), 1L)), s"batch-2 emissions: ${emitted()}")
    // state now holds ONLY user 2's open buffer — user 1 evicted entirely
    val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
    assert(stateRows == 1L, s"state must hold exactly user 2's buffer: $stateRows")
    // batch 3: 14:00 starts a NEW user-2 session (gap 60min) and its
    // watermark (13:50) closes the 13:00 one — mid-stream closure on the
    // same key that received data.
    mem.addData((2L, ts(14, 0)))
    q.processAllAvailable()
    assert(emitted() == Set(
      (1L, us(10, 0), us(10, 10), 2L),
      (1L, us(11, 30), us(11, 30), 1L),
      (2L, us(13, 0), us(13, 0), 1L)), s"batch-3 emissions: ${emitted()}")
    q.stop()
  }

  test("q130 protocol: transformWithState sessions match the q125 machine batch by batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp)]
      val src = mem.toDF().toDF("user_id", "ts_utc")
        .withColumn("ts_us", unix_micros(col("ts_utc")))
      val name = s"graft_tws_${System.nanoTime()}"
      val q = EventStreams.gapSessionsTwsFrom(src)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      def us(h: Int, m: Int) = ts(h, m).getTime * 1000L
      def emitted() = s.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // the exact q125 protocol replay: same batches, same expected closures
      mem.addData((1L, ts(10, 0)), (1L, ts(10, 10)), (1L, ts(11, 30)))
      q.processAllAvailable()
      assert(emitted() == Set((1L, us(10, 0), us(10, 10), 2L)),
        s"batch-1 emissions: ${emitted()}")
      mem.addData((2L, ts(13, 0)))
      q.processAllAvailable()
      assert(emitted() == Set(
        (1L, us(10, 0), us(10, 10), 2L),
        (1L, us(11, 30), us(11, 30), 1L)), s"batch-2 emissions: ${emitted()}")
      mem.addData((2L, ts(14, 0)))
      q.processAllAvailable()
      assert(emitted() == Set(
        (1L, us(10, 0), us(10, 10), 2L),
        (1L, us(11, 30), us(11, 30), 1L),
        (2L, us(13, 0), us(13, 0), 1L)), s"batch-3 emissions: ${emitted()}")
      q.stop()
    } finally prev.fold(s.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
      s.conf.set("spark.sql.streaming.stateStore.providerClass", _))
  }

  test("B34: streaming dedup keeps one copy per event_id") {
    val n = EventStreams.dedupCounts(spark, TestSpark.Sf0001)
      .agg(sum("n")).collect().head.getLong(0)
    val distinct = Tables(spark, TestSpark.Sf0001).eventsUs.count()
    assert(n == distinct)
  }

  test("stream-stream interval join matches the batch join identity and bounds state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val imps = MemoryStream[(String, Timestamp)]
    val clicks = MemoryStream[(String, Timestamp)]
    val joined = EventStreams.intervalJoin(
      imps.toDF().toDF("l_key", "imp_time"),
      clicks.toDF().toDF("r_key", "click_time"))
    val name = s"graft_ssj_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name).outputMode("append").start()
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    imps.addData(("ad1", ts(10, 0)), ("ad2", ts(10, 0)))
    clicks.addData(("ad1", ts(10, 5)),   // within 10 min → match
      ("ad1", ts(10, 20)),               // outside the window → no match
      ("ad2", ts(9, 55)))                // click before impression → no match
    q.processAllAvailable()
    q.stop()
    val got = s.table(name)
      .select("l_key", "imp_time", "click_time")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSeq
    assert(got == Seq(("ad1", ts(10, 0), ts(10, 5))), s"unexpected join result: $got")
    // the same relation expressed as a batch join — the streaming result
    // must be exactly the batch interval-join over the full inputs
    val bImps = Seq(("ad1", ts(10, 0)), ("ad2", ts(10, 0))).toDF("l_key", "imp_time")
    val bClicks = Seq(("ad1", ts(10, 5)), ("ad1", ts(10, 20)), ("ad2", ts(9, 55)))
      .toDF("r_key", "click_time")
    val batch = bImps.join(bClicks, expr(
      "l_key = r_key AND click_time >= imp_time AND click_time <= imp_time + INTERVAL 10 minutes"))
      .select("l_key", "imp_time", "click_time")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSeq
    assert(got == batch)
  }

  test("B34 variant: dropDuplicatesWithinWatermark dedups within the horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val deduped = mem.toDF().toDF("ts_utc", "id")
      .withWatermark("ts_utc", "1 hour")
      .dropDuplicatesWithinWatermark("id")
    val name = s"graft_ddw_${System.nanoTime()}"
    val q = deduped.writeStream.format("memory").queryName(name).outputMode("append").start()
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    mem.addData((ts(9, 0), 1L), (ts(9, 1), 1L), (ts(9, 2), 2L)) // dup id=1 in-batch
    q.processAllAvailable()
    mem.addData((ts(9, 30), 1L)) // dup id=1 within watermark → dropped
    q.processAllAvailable()
    q.stop()
    val ids = s.table(name).select("id").as[Long].collect().toSeq
    assert(ids.sorted == Seq(1L, 2L), s"expected exactly one copy per id: $ids")
  }

  test("B32 protocol: a current watermark drops late rows before AND after first emission") {
    // Pins the watermark protocol q70's oracle leans on (measured on this
    // Spark): the late-input filter for an append-mode aggregation uses the
    // watermark current during the PREVIOUS batch, while end-of-batch
    // eviction/emission uses the current one. processAllAvailable between
    // adds runs the trailing no-data batch, so here the filter watermark is
    // caught up and late rows drop in BOTH positions — a late row for a
    // window not yet emitted (batch 1) and one for a window already emitted
    // (batch 2). The q70 replay inserts its watermark-carrier batch for the
    // same reason: under back-to-back AvailableNow batches the filter
    // watermark lags one batch.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Timestamp]
    val agg = mem.toDF().toDF("ts_utc")
      .withWatermark("ts_utc", "10 minutes")
      .groupBy(window(col("ts_utc"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w"), col("cnt"))
    val name = s"graft_wmproto_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(name).outputMode("append").start()
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    mem.addData((0 to 5).map(h => ts(h, 30)): _*) // wm → 05:20
    q.processAllAvailable()
    // late for hour 0 (window NOT yet emitted) + on-time hour 6;
    // end of batch emits windows ≤ 05:20
    mem.addData(ts(0, 10), ts(6, 0))
    q.processAllAvailable()
    // late for hour 0 again (window ALREADY emitted) + on-time hour 8
    mem.addData(ts(0, 20), ts(8, 0))
    q.processAllAvailable()
    q.stop()
    val hour0 = s.table(name).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)))
      .filter(_._1 == ts(0, 0))
    assert(hour0.toSeq == Seq((ts(0, 0), 1L)),
      s"hour-0 must be emitted once, counting only the on-time row: ${hour0.toSeq}")
  }
}
