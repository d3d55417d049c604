package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Structured Streaming surface over the `events` table (SURVEY B31–B34).
  *
  * Streams are file-source replays of the fixture parquet: `readStream` →
  * event-time transforms → memory sink, driven to completion with
  * `Trigger.AvailableNow`. The same transformations run against a real
  * unbounded source unchanged; watermarks bound state at scale.
  *
  * Mode notes: bounded replays use `complete` output for windowed aggregates
  * — in `append` mode, windows at the tail of a bounded stream sit above the
  * final watermark and would never be emitted. Watermark + append + late-data
  * *drop* semantics are exercised in the ScalaTest specs with crafted inputs,
  * where the expected emissions are controlled.
  *
  * Event time: the fixture's nanosecond timestamps arrive as long nanos
  * (see [[graft.Tables.eventsUs]]); `ts_utc` is the derived micros timestamp
  * used for watermarks/windows, and bucket ids are emitted as epoch-based
  * integers so results are engine- and timezone-portable.
  */
object EventStreams {
  type Q = (SparkSession, String) => DataFrame

  private val runId = new AtomicLong(0)

  /** Memory-sink view names from prior replays, dropped on the next replay
    * of the SAME session (keyed by the session OBJECT so distinct sessions
    * can never collide; weak keys let a closed session's entry go with it).
    * Replays are driven sequentially per session — Bench, Verify, and the
    * specs all consume a replay's result before starting the next.
    */
  private val staleSinks =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Buffer[String]]())

  /** Scratch root for replay staging + throwaway checkpoints: a tmpfs when
    * the host has one (offset/commit WAL and state-store delta files are
    * fsync-heavy small writes — RAM-backed beats disk), else the tmp dir.
    * Replays are rebuildable, so nothing here needs to survive a reboot.
    */
  private[graft] val scratchBase: String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm)) shm.toString
    else System.getProperty("java.io.tmpdir")
  }

  /** Streaming view of events with `ts_us` (BIGINT µs) + `ts_utc` timestamp. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // cached table registry: the schema read costs a parquet footer only once
    val schema = graft.Tables(spark, dir).table("events").schema
    // The file stream source wants a directory of files (the unbounded-ingest
    // layout); the fixture is a single file, so stage it into a per-sf temp
    // directory once and replay from there. Staged as SEVERAL files, not a
    // byte copy: the microbatch scan parallelizes per file, and one ~5 MB
    // parquet is a single input split — a single-threaded scan at the head
    // of every replay. (Row order is irrelevant: every streaming query here
    // aggregates or dedups, and all checks sort.)
    val stageDir = ReplayStage.stage(spark, s"$dir/events.parquet",
      s"graft_events_stage_${Integer.toHexString(dir.hashCode)}", n = 8)
    val raw = spark.readStream.schema(schema).parquet(stageDir)
    val tsUs = schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case _        => unix_micros(col("ts").cast(TimestampType))
    }
    raw.withColumn("ts_us", tsUs)
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
      .drop("ts")
  }

  /** Runs a (bounded) streaming DataFrame to completion into a memory sink
    * and returns the materialized result.
    */
  def runToMemory(spark: SparkSession, df: DataFrame, mode: String): DataFrame = {
    // Replay sinks are consumed immediately by the caller; earlier replays'
    // memory tables would otherwise pin their rows for the session lifetime
    // (a bench/verify run does dozens of replays).
    val sessionSinks = staleSinks.computeIfAbsent(
      spark, _ => scala.collection.mutable.Buffer.empty[String])
    sessionSinks.synchronized {
      sessionSinks.foreach(spark.catalog.dropTempView(_))
      sessionSinks.clear()
    }
    val name = s"graft_stream_${runId.incrementAndGet()}_${System.nanoTime()}"
    sessionSinks.synchronized { sessionSinks += name }
    // Stateful operators allocate one state store per shuffle partition up
    // front; for these bounded replays a couple is plenty (a real cluster
    // deployment sizes this to its executor count instead). The trailing
    // no-data microbatch exists to close event-time windows promptly on a
    // LIVE stream; an AvailableNow replay terminates anyway, so it only adds
    // a full extra microbatch of latency.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val prevNoData = spark.conf.getOption("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.shuffle.partitions",
      spark.conf.getOption("spark.graft.stream.partitions").getOrElse("4"))
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    // Throwaway-replay checkpoint hygiene: retain a single batch (nothing
    // resumes from these checkpoints) and skip per-row state format
    // validation (the schema is fixed by the plan that just built it).
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "1")
    spark.conf.set("spark.sql.streaming.stateStore.formatValidation.enabled", "false")
    // Each replay registers fresh state-store providers (new checkpoint);
    // they accumulate in the provider cache for the session's lifetime, and
    // the default 60s maintenance sweep would iterate and snapshot ALL of
    // them mid-bench. Replays never resume, so maintenance is pure overhead.
    spark.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
    spark.conf.set("spark.sql.streaming.stateStore.minDeltasForSnapshot", "1000")
    // A bounded replay fits one microbatch, and Trigger.Once pays one less
    // offset-planning round than AvailableNow (~0.1 s on the measured
    // floor). A LIVE deployment would use AvailableNow/processing-time
    // triggers — selectable via spark.graft.stream.trigger.
    val trigger = spark.conf.getOption("spark.graft.stream.trigger").getOrElse("once") match {
      case "once" => Trigger.Once(): @annotation.nowarn("cat=deprecation")
      case _ => Trigger.AvailableNow()
    }
    try {
      val writer = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(trigger)
      // Optional scratch checkpoint root (e.g. a tmpfs on hosts where the
      // default tmp dir is slow disk). Replays are rebuildable by
      // definition, so losing the checkpoint on restart costs nothing — a
      // durable deployment sets a real checkpointLocation and never goes
      // through runToMemory.
      val ckpt = Some(spark.conf.getOption("spark.graft.stream.checkpointBase")
          .getOrElse(scratchBase)).map { base =>
        val dir = java.nio.file.Paths.get(base, s"graft_ckpt_$name")
        writer.option("checkpointLocation", dir.toString)
        dir
      }
      val q = writer.start()
      q.awaitTermination()
      // Probe hook: surface the engine's own per-phase timing breakdown.
      if (spark.conf.getOption("spark.graft.stream.debugProgress").contains("true"))
        q.recentProgress.foreach(p => println(s"PROGRESS ${p.json}"))
      ckpt.foreach { dir => // best-effort scratch cleanup
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.walk(dir)
        try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally s.close()
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      prevNoData.fold(spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled"))(
        v => spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v))
    }
    spark.table(name)
  }

  /** B31: tumbling 1-hour window counts by event type. */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame = {
    val agg = readEvents(spark, dir)
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("bucket_us"), col("event_type"), col("cnt"))
    runToMemory(spark, agg, "complete")
      .orderBy("bucket_us", "event_type")
  }

  /** B33: session windows (30-minute gap) per user → sessions per user. */
  def sessionCounts(spark: SparkSession, dir: String): DataFrame = {
    val agg = readEvents(spark, dir)
      .groupBy(session_window(col("ts_utc"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id")) // one row per session; the count itself stays in state
    runToMemory(spark, agg, "complete")
      .groupBy("user_id").agg(count(lit(1)).cast(LongType).as("n_sessions"))
      .orderBy("user_id")
  }

  /** B31: sliding 1-hour windows every 30 minutes — each event lands in two
    * overlapping buckets.
    */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame = {
    val agg = readEvents(spark, dir)
      .groupBy(window(col("ts_utc"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("bucket_us"), col("event_type"), col("cnt"))
    runToMemory(spark, agg, "complete")
      .orderBy("bucket_us", "event_type")
  }

  /** Custom keyed state (the `mapGroupsWithState` surface): a per-user
    * running event counter held in explicit GroupState. The bounded replay
    * is one microbatch, so each user emits exactly one update; the batch-side
    * max() collapse keeps the result well-defined under any batching.
    */
  def statefulUserCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val updates = readEvents(spark, dir)
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }
      .toDF("user_id", "n")
    runToMemory(spark, updates, "update")
      .groupBy("user_id").agg(max("n").as("n"))
      .orderBy("user_id")
  }

  /** B34: stateful streaming dedup — inject a duplicate of every event into
    * the stream, dedup on event_id in the stream, then count survivors per
    * type batch-side. (Duplication happens in-stream via a generator rather
    * than a second file source: the dedup STATE does identical work either
    * way, without paying a second source's offset/scan machinery.)
    */
  def dedupCounts(spark: SparkSession, dir: String): DataFrame = {
    val twice = readEvents(spark, dir)
      .withColumn("_copy", explode(array(lit(1), lit(2))))
    // project BEFORE dropDuplicates: streaming dedup state keeps the whole
    // input row per key, so the projection decides the state size
    val deduped = twice.select("event_id", "event_type")
      .dropDuplicates("event_id")
    runToMemory(spark, deduped, "append")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Stream-stream inner join with an event-time range condition (the ad
    * impression→click attribution shape): a click matches an impression on
    * the same key within `[imp_time, imp_time + windowSpec]`.
    *
    * Both sides carry watermarks, so the join STATE is bounded: Spark
    * evicts buffered left rows once the right watermark passes
    * `imp_time + window` (and vice versa) — without both watermarks a
    * stream-stream inner join would buffer forever. Columns: left must have
    * `(key, imp_time)`, right `(key, click_time)`.
    *
    * Scale shape: the join shuffles both streams by `key` into co-located
    * state stores — the same hash-partitioned layout a batch shuffle join
    * uses, with eviction replacing the batch build/probe lifetime.
    */
  def intervalJoin(impressions: DataFrame, clicks: DataFrame,
                   window: String = "10 minutes",
                   watermark: String = "1 hour"): DataFrame = {
    val l = impressions.withWatermark("imp_time", watermark)
    val r = clicks.withWatermark("click_time", watermark)
    l.join(r, expr(
      s"""l_key = r_key AND
          click_time >= imp_time AND
          click_time <= imp_time + INTERVAL $window"""))
  }

  // ------------------------------------------------------- declared queries

  val queries: Map[String, Q] = Map(
    "q60_stream_tumbling" -> ((s, dir) => tumblingCounts(s, dir)),
    "q61_stream_dedup" -> ((s, dir) => dedupCounts(s, dir)),
    "q62_stream_session" -> ((s, dir) => sessionCounts(s, dir)),
    "q63_stream_sliding" -> ((s, dir) => slidingCounts(s, dir)),
    "q64_stream_stateful_count" -> ((s, dir) => statefulUserCounts(s, dir)),
  )

  /** All three streaming results are deterministic aggregates of the bounded
    * replay, so batch-SQL oracles cross-check the streaming semantics —
    * including session windows against the gap-based batch identity.
    */
  val oracles: Map[String, String] = Map(
    "q60_stream_tumbling" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us, event_type, COUNT(*) AS cnt
         FROM events GROUP BY 1, 2 ORDER BY bucket_us, event_type""",
    "q61_stream_dedup" ->
      "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type ORDER BY event_type",
    // sliding 1h/30min: every event belongs to exactly two window starts
    "q63_stream_sliding" ->
      """SELECT bucket_us, event_type, COUNT(*) AS cnt FROM (
           SELECT event_type, unnest([(epoch_us(ts) // 1800000000) * 1800000000,
                                      (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000]) AS bucket_us
           FROM events) b
         GROUP BY 1, 2 ORDER BY bucket_us, event_type""",
    "q64_stream_stateful_count" ->
      "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id ORDER BY user_id",
    "q62_stream_session" ->
      """SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions FROM (
           SELECT user_id, CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS new_sess
           FROM (SELECT user_id, epoch_us(ts) AS ts_us,
                        LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
                 FROM events) g) h
         GROUP BY user_id ORDER BY user_id""",
  )
}
