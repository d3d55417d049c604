package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.SparkEntry
import graft.streaming.EventStreams

/** Dev tool: TWO-DECADE scale probe for the STREAMING family — the batch
  * families have `SCALE100.json`; this writes the streaming counterpart
  * `SCALE100_streaming.json` so the 12 streaming queries' 100 TB story
  * rests on measurement, not design argument alone.
  *
  * Ops, at 600k / 6M / 60M events (×6/×60/×600 of the sf0.1 fixture):
  *
  *  - `tumbling`  — the EXACT q60 plan ([[EventStreams.tumblingFrame]]):
  *    watermarkless windowed count, complete mode;
  *  - `interval_join` — the EXACT q73 plan
  *    ([[EventStreams.attributionPairsFrame]]): stream-stream inner
  *    interval join, both sides buffered in state;
  *  - `outer_join` — the EXACT q80 plan
  *    ([[EventStreams.attributionOuterFrame]]): watermark-gated
  *    null-emission protocol incl. the trailing no-data batch;
  *  - `upsert` — the FULL q98 path ([[EventStreams.streamUpsert]]):
  *    foreachBatch CDC merge with parquet snapshot versions and the
  *    content-signed StageDir publish.
  *
  * The frames run into the NOOP streaming sink (a real deployment writes
  * to a distributed sink; the memory sink used by the certified replays
  * would materialize the ×600 join output on the driver and measure the
  * collect, not the operator). Scaling is DENSITY scaling — copies get
  * disjoint user/event ids in the SAME 30-day span, replayed as ONE
  * microbatch, exactly like the certified replays — so join/agg state
  * grows with input and the probe exercises state capacity, the hard
  * axis. State rows/bytes come from the engine's own `stateOperators`
  * progress metrics; shuffle bytes from a stage listener; rows/s is
  * fixture rows over wall.
  *
  * State-store partitions are pinned at 32 across ALL scales (a real
  * deployment sizes them to the executor count, and a varying count would
  * make the per-partition state curves incomparable); exponents are
  * end-decade `ln(last/first)/ln(rows ratio)`, ≈1 = linear.
  */
object Scale100StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.graft.stream.partitions", "32")
        .config("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val totalShuffle = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        totalShuffle.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val inputRows = new java.util.concurrent.atomic.AtomicLong(0)
    val stateRows = new java.util.concurrent.atomic.AtomicLong(0)
    val stateBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        inputRows.addAndGet(e.progress.numInputRows)
        val ops = e.progress.stateOperators
        if (ops.nonEmpty) {
          stateRows.getAndUpdate(m => math.max(m, ops.map(_.numRowsTotal).sum))
          stateBytes.getAndUpdate(m => math.max(m, ops.map(_.memoryUsedBytes).sum))
        }
      }
    })

    // Density-scaled single-file fixtures (the streaming reader stages from
    // `<dir>/events.parquet`, a FILE), cached across invocations in /tmp.
    val base = "/tmp/graft_scale100"
    def fixture(mult: Int): String = {
      val dir = s"$base/stream_$mult"
      val target = Paths.get(dir, "events.parquet")
      if (!Files.exists(target)) {
        val scaled = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
          .select(col("*"), explode(sequence(lit(0L), lit(mult - 1L))).as("_i"))
          .withColumn("user_id", col("user_id") + col("_i") * 10000000L)
          .withColumn("event_id", col("event_id") + col("_i") * 1000000000L)
          .drop("_i")
        Files.createDirectories(Paths.get(dir))
        scaled.coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp_onefile")
        val part = Files.list(Paths.get(s"$dir/tmp_onefile"))
        val one = try {
          import scala.jdk.CollectionConverters._
          part.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
        } finally part.close()
        Files.move(one, target)
        graft.StageDir.deleteRecursively(Paths.get(s"$dir/tmp_onefile"))
      }
      dir
    }

    def runNoop(df: DataFrame, mode: String, noDataBatch: Boolean): Unit = {
      val prevNoData = spark.conf.getOption("spark.sql.streaming.noDataMicroBatches.enabled")
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noDataBatch.toString)
      // stream-side shuffle partitions = state stores; pinned to 32 via
      // spark.sql.shuffle.partitions already (the certified replays shrink
      // to 4 through runToMemory; the probe IS the at-scale configuration)
      val ckpt = Paths.get(graft.StageDir.scratchBase,
        s"graft_ckpt_probe_${System.nanoTime()}")
      try {
        val q = df.writeStream.format("noop").outputMode(mode)
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt.toString)
          .start()
        q.awaitTermination()
      } finally {
        // Unload every cached state-store provider: the loaded-provider map
        // keeps the JUST-FINISHED query's state (5 GB at x600) referenced
        // after termination, so without this the next timed point runs
        // under that much dead heap and measures GC pressure, not the
        // operator (observed: isolated upsert x600 29 s vs 73–100 s when
        // run after the two big-state joins).
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        graft.StageDir.deleteRecursively(ckpt)
        prevNoData.fold(spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled"))(
          v => spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v))
      }
    }

    final case class M(op: String, mult: Int, rows: Long, wallS: Double,
                       rowsPerSec: Double, stateRows: Long, stateMb: Double,
                       shuffleMb: Double)
    val results = scala.collection.mutable.ArrayBuffer.empty[M]
    def time(op: String, mult: Int, rows: Long)(f: => Unit): Unit = {
      Thread.sleep(300)
      totalShuffle.set(0); inputRows.set(0); stateRows.set(0); stateBytes.set(0)
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      val m = M(op, mult, rows, wall, rows / wall, stateRows.get(),
        stateBytes.get() / 1e6, totalShuffle.get() / 1e6)
      results += m
      println(f"SCALE100S ${m.op}%-14s x${m.mult}%-4d rows=${m.rows}%-9d wall=${m.wallS}%7.2f s " +
        f"rps=${m.rowsPerSec / 1e6}%6.2f M/s state=${m.stateRows}%-9d stateMb=${m.stateMb}%8.1f shuffleMb=${m.shuffleMb}%8.1f")
    }

    // JVM/codegen/state-store warm-up on the base fixture — not measured
    runNoop(EventStreams.tumblingFrame(spark, "/root/testdata/sf0.1"), "complete", noDataBatch = false)

    // numeric args select scale points; name args select ops (both optional)
    val mults = {
      val ns = args.filter(_.forall(_.isDigit)).map(_.toInt).toSeq
      if (ns.isEmpty) Seq(6, 60, 600) else ns
    }
    // "rocksdb" arg: run the stateful plans over RocksDBStateStoreProvider
    // (off-heap state — the provider a long-lived cluster deployment would
    // pick) instead of the default on-heap HDFS-backed provider. Scratch
    // comparison only; the committed artifact always measures the default.
    if (args.contains("rocksdb"))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val defaultOps = Set("tumbling", "interval_join", "outer_join", "upsert")
    val ops = {
      val names = args.filterNot(_.forall(_.isDigit)).toSet - "rocksdb"
      if (names.isEmpty) defaultOps else names
    }
    for (mult <- mults) {
      val dir = fixture(mult)
      val rows = spark.read.parquet(s"$dir/events.parquet").count()
      // unmeasured throwaway replay: pays the one-time ReplayStage split of
      // this fixture (and table-registry schema probe) OUTSIDE the timed
      // window, uniformly for every scale point
      runNoop(EventStreams.tumblingFrame(spark, dir), "complete", noDataBatch = false)
      if (ops("tumbling")) time("tumbling", mult, rows) {
        runNoop(EventStreams.tumblingFrame(spark, dir), "complete", noDataBatch = false)
      }
      if (ops("interval_join")) time("interval_join", mult, rows) {
        runNoop(EventStreams.attributionPairsFrame(spark, dir), "append", noDataBatch = false)
      }
      if (ops("outer_join")) time("outer_join", mult, rows) {
        runNoop(EventStreams.attributionOuterFrame(spark, dir), "append", noDataBatch = true)
      }
      if (ops("upsert")) time("upsert", mult, rows) {
        // full production path: foreachBatch merge + snapshot versions +
        // content-signed publish; forced through the noop BATCH sink
        EventStreams.streamUpsert(spark, dir).write.mode("overwrite").format("noop").save()
      }
    }

    def j(d: Double) = f"$d%.3f"
    val rowsJson = results.map(m =>
      s"""{"op":"${m.op}","mult":${m.mult},"rows":${m.rows},"wall_s":${j(m.wallS)},""" +
        s""""rows_per_s":${j(m.rowsPerSec)},"state_rows":${m.stateRows},""" +
        s""""state_mb":${j(m.stateMb)},"shuffle_mb":${j(m.shuffleMb)}}""")
    val exponents = results.map(_.op).distinct.map { op =>
      val ms = results.filter(_.op == op).sortBy(_.mult)
      val (f, l) = (ms.head, ms.last)
      val span = math.log(l.rows.toDouble / f.rows)
      val aWall = math.log(l.wallS / f.wallS) / span
      val aState =
        if (f.stateRows > 0 && l.stateRows > 0)
          j(math.log(l.stateRows.toDouble / f.stateRows) / span)
        else "null"
      val aShuf = math.log(math.max(l.shuffleMb, 0.1) / math.max(f.shuffleMb, 0.1)) / span
      s""""$op":{"wall":${j(aWall)},"state_rows":$aState,"shuffle":${j(aShuf)}}"""
    }
    val artifact =
      s"""{"probe":"scale100_streaming","base_sf":"sf0.1","cores":32,"state_partitions":32,""" +
        s""""protocol":"cold fresh plan, noop streaming sink (upsert: full foreachBatch parquet path), single-microbatch AvailableNow replay, density-scaled disjoint-id copies in one 30-day span, one run per point",""" +
        s""""measurements":[${rowsJson.mkString(",")}],""" +
        s""""exponents":{${exponents.mkString(",")}}}"""
    // a filtered or rocksdb run is a scratch experiment — never overwrite
    // the committed full-matrix artifact with partial/off-default results
    // (ops must EQUAL the default set: four unrecognized names would run
    // nothing yet still clobber the artifact with an empty matrix)
    if (mults == Seq(6, 60, 600) && ops == defaultOps && results.nonEmpty &&
        !args.contains("rocksdb"))
      Files.write(Paths.get("SCALE100_streaming.json"),
        (artifact + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(artifact)
    spark.stop()
  }
}
