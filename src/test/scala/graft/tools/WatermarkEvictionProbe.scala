package graft.tools

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.streaming.EventStreams

/** Dev tool: proves the streaming joins' state is WATERMARK-bounded, not
  * input-bounded, across micro-batches — the evidence the single-batch
  * AvailableNow sweep (`Scale100StreamProbe`) cannot produce, because one
  * batch ingests everything before the watermark ever advances and
  * `state_rows` necessarily equals total rows (exponent 1.00).
  *
  * Fixtures scale DURATION, not density: `mult` time-shifted copies of the
  * sf0.1 events (same per-day event rate, same user-id space — temporal
  * recurrence, disjoint event ids), staged as `mult` TIME-CONTIGUOUS files
  * with ascending mtimes and replayed one file per micro-batch. Each batch
  * advances the watermark past the previous copy, so interval/outer join
  * state from old copies is EVICTED between batches: per-batch state stays
  * ≈ one copy's rows (+ the ≤1.5 h overlap the 1 h delay + 30 min window
  * keeps alive) while total input grows 100×. Flat `state_rows_max` across
  * the decades (exponent ≈ 0 vs total rows) is the bounded-state claim; a
  * leak would show monotone per-batch growth instead of a plateau (the
  * per-batch series is committed in the artifact). Writes
  * `SCALE_WATERMARK.json`.
  */
object WatermarkEvictionProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.graft.stream.partitions", "32")
        .config("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class B(batch: Long, inputRows: Long, stateRows: Long)
    val series = new java.util.concurrent.ConcurrentLinkedQueue[B]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        series.add(B(e.progress.batchId, e.progress.numInputRows,
          e.progress.stateOperators.map(_.numRowsTotal).sum))
    })

    val base = "/tmp/graft_scale100"

    /** `mult` time-shifted copies staged as `mult` time-contiguous files. */
    def fixture(mult: Int): String = {
      val dir = s"$base/wm_$mult"
      if (!Files.exists(Paths.get(dir, "_STAGED"))) {
        val ev0 = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
        val tsUs = ev0.schema("ts").dataType match {
          case LongType => expr("ts div 1000")
          case _        => unix_micros(col("ts").cast(TimestampType))
        }
        val ev = ev0.withColumn("ts_us", tsUs).drop("ts")
        val r = ev.agg(min("ts_us"), max("ts_us")).head()
        val shift = (r.getLong(1) - r.getLong(0)) + 86400000000L // span + 1 day
        val scaled = ev
          .select(col("*"), explode(sequence(lit(0L), lit(mult - 1L))).as("_i"))
          .withColumn("ts_us", col("ts_us") + col("_i") * shift)
          .withColumn("event_id", col("event_id") + col("_i") * 1000000000L)
          .drop("_i")
        val scratch = s"$dir/tmp_sorted"
        scaled.repartitionByRange(mult, col("ts_us"))
          .sortWithinPartitions("ts_us")
          .write.mode("overwrite").parquet(scratch)
        Files.createDirectories(Paths.get(dir, "data"))
        val listing = Files.list(Paths.get(scratch))
        val partsSorted =
          try {
            import scala.jdk.CollectionConverters._
            listing.iterator().asScala
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .toSeq.sortBy(_.getFileName.toString)
          } finally listing.close()
        partsSorted.zipWithIndex.foreach { case (p, i) =>
          val dest = Paths.get(dir, "data", f"t$i%05d.parquet")
          Files.move(p, dest)
          Files.setLastModifiedTime(dest, FileTime.fromMillis(1000000000000L + i * 60000L))
        }
        graft.StageDir.deleteRecursively(Paths.get(scratch))
        Files.createFile(Paths.get(dir, "_STAGED"))
      }
      s"$dir/data"
    }

    def src(dataDir: String): DataFrame = {
      val schema = spark.read.parquet(dataDir).schema
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dataDir)
        .withColumn("ts_utc", timestamp_micros(col("ts_us")))
    }

    def runNoop(df: DataFrame, noDataBatch: Boolean): Unit = {
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noDataBatch.toString)
      val ckpt = Paths.get(graft.StageDir.scratchBase, s"graft_ckpt_wm_${System.nanoTime()}")
      try {
        val q = df.writeStream.format("noop").outputMode("append")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt.toString)
          .start()
        q.awaitTermination()
      } finally {
        // unload cached state-store providers (see Scale100StreamProbe: a
        // finished query's state otherwise stays referenced and the next
        // point measures GC pressure)
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        graft.StageDir.deleteRecursively(ckpt)
        spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      }
    }

    val mults = {
      val ns = args.filter(_.forall(_.isDigit)).map(_.toInt).toSeq
      if (ns.isEmpty) Seq(6, 60, 600) else ns
    }
    val defaultOps = Set("interval_join", "outer_join", "sessionize", "sessionize_tws")
    val ops = {
      val names = args.filterNot(_.forall(_.isDigit)).toSet
      if (names.isEmpty) defaultOps else names
    }

    final case class M(op: String, mult: Int, rows: Long, batches: Int,
                       stateMax: Long, stateFinal: Long, wallS: Double,
                       ser: Seq[(Long, Long, Long)])
    val results = scala.collection.mutable.ArrayBuffer.empty[M]

    def time(op: String, mult: Int, dataDir: String)(mk: => DataFrame)(noData: Boolean): Unit = {
      val rows = spark.read.parquet(dataDir).count()
      series.clear()
      val t0 = System.nanoTime()
      runNoop(mk, noData)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener drain
      import scala.jdk.CollectionConverters._
      val ser = series.asScala.toSeq.sortBy(_.batch)
        .map(b => (b.batch, b.inputRows, b.stateRows))
      val m = M(op, mult, rows, ser.size,
        if (ser.isEmpty) 0 else ser.map(_._3).max,
        if (ser.isEmpty) 0 else ser.last._3, wall, ser)
      results += m
      println(f"WMPROBE ${m.op}%-13s x$mult%-4d rows=${m.rows}%-9d batches=${m.batches}%-4d " +
        f"stateMax=${m.stateMax}%-9d stateFinal=${m.stateFinal}%-9d wall=${m.wallS}%7.2f s")
    }

    // warm-up on the smallest fixture (JIT/codegen/state-store) — not recorded
    runNoop(EventStreams.attributionPairsFrom(src(fixture(mults.min)), src(fixture(mults.min))),
      noDataBatch = false)
    results.clear()

    for (mult <- mults) {
      val dataDir = fixture(mult)
      if (ops("interval_join"))
        time("interval_join", mult, dataDir) {
          EventStreams.attributionPairsFrom(src(dataDir), src(dataDir))
        }(noData = false)
      if (ops("outer_join"))
        time("outer_join", mult, dataDir) {
          EventStreams.attributionOuterFrom(src(dataDir), src(dataDir))
        }(noData = true)
      // the session state machines buffer ONLY open sessions (emitted ones
      // leave state in the same invocation), so per-batch state must
      // plateau at ≈ one copy's still-open tail while input grows 100×
      if (ops("sessionize"))
        time("sessionize", mult, dataDir) {
          EventStreams.gapSessionsFrom(src(dataDir))
        }(noData = true)
      if (ops("sessionize_tws")) {
        // transformWithState REQUIRES the RocksDB provider — the op's own
        // contract, set for its runs only (state rows are comparable; the
        // memoryUsedBytes axis is not, and the artifact doesn't carry it).
        // Save/restore rather than unset: a session-level provider choice
        // must survive this leg (the gapSessionsTws pattern).
        val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try time("sessionize_tws", mult, dataDir) {
          EventStreams.gapSessionsTwsFrom(src(dataDir))
        }(noData = true)
        finally prev.fold(spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
      }
    }

    def j(d: Double) = f"$d%.3f"
    // downsample long series for the artifact: every kth batch plus the last
    def serJson(ser: Seq[(Long, Long, Long)]): String = {
      val k = math.max(1, ser.size / 40)
      val kept = ser.zipWithIndex
        .filter { case (_, i) => i % k == 0 || i == ser.size - 1 }.map(_._1)
      kept.map { case (b, in, st) => s"""{"batch":$b,"input_rows":$in,"state_rows":$st}""" }
        .mkString("[", ",", "]")
    }
    val rowsJson = results.map(m =>
      s"""{"op":"${m.op}","mult":${m.mult},"rows":${m.rows},"batches":${m.batches},""" +
        s""""state_rows_max":${m.stateMax},"state_rows_final":${m.stateFinal},""" +
        s""""wall_s":${j(m.wallS)},"series":${serJson(m.ser)}}""")
    val exponents = results.map(_.op).distinct.map { op =>
      val ms = results.filter(_.op == op).sortBy(_.mult)
      if (ms.size < 2) s""""$op":null"""
      else {
        val (f, l) = (ms.head, ms.last)
        val span = math.log(l.rows.toDouble / f.rows)
        val aState = math.log(l.stateMax.toDouble / math.max(f.stateMax, 1)) / span
        val aWall = math.log(l.wallS / f.wallS) / span
        s""""$op":{"state_rows_max":${j(aState)},"wall":${j(aWall)}}"""
      }
    }
    val artifact =
      s"""{"probe":"watermark_eviction","base_sf":"sf0.1","cores":32,"state_partitions":32,""" +
        s""""protocol":"duration-scaled fixtures (mult time-shifted copies of sf0.1 events, constant per-day density, same user ids, disjoint event ids), staged as mult time-contiguous files, one file per micro-batch (AvailableNow + maxFilesPerTrigger=1), noop sink; state from StreamingQueryProgress per batch; sessionize = q125 flatMapGroupsWithState machine (default provider), sessionize_tws = q130 transformWithState machine (RocksDB, its required provider)",""" +
        s""""measurements":[${rowsJson.mkString(",")}],""" +
        s""""exponents_vs_total_rows":{${exponents.mkString(",")}}}"""
    if (mults == Seq(6, 60, 600) && ops == defaultOps && results.nonEmpty)
      Files.write(Paths.get("SCALE_WATERMARK.json"),
        (artifact + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(artifact)
    spark.stop()
  }
}
