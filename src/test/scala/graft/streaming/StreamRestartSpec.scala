package graft.streaming

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Kill-and-restore-from-checkpoint equivalence for the stateful streaming
  * replays (q73 interval join, q80 outer join, q98 upsert): a run terminated
  * at a batch boundary — the checkpointed kill; AvailableNow termination and
  * a crash-after-commit recover identically, from the same offset log +
  * state-store checkpoint — and re-launched on the SAME checkpoint must
  * converge to the uninterrupted run's result. This is the property a
  * continuous 100 TB pipeline actually relies on: executors and drivers
  * die mid-stream, the checkpoint brings the query back, and nothing is
  * lost, duplicated, or re-emitted.
  *
  * The source is staged as two TIME-CONTIGUOUS files (split at the time
  * midpoint, ascending modification times) so the restarted phase contains
  * no late data w.r.t. the phase-1 watermark — the supported contract: a
  * restore never rewinds the watermark, so pre-watermark events after a
  * restart would be dropped exactly as they would mid-run.
  */
class StreamRestartSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = graft.TestSpark.Sf0001

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  /** Events with `ts` normalized to a µs long (plain reads surface the
    * fixture's nano timestamps differently per session config; the staged
    * halves carry an unambiguous `ts_us` instead).
    */
  private def eventsUs: DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val tsUs = ev.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case _        => unix_micros(col("ts").cast(TimestampType))
    }
    ev.withColumn("ts_us", tsUs).drop("ts")
  }

  /** The two time-halves of sf0.001 events, one parquet file each. */
  private lazy val halves: Seq[Path] = {
    val ev = eventsUs
    val r = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val mid = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 2
    val hold = tmp("graft_restart_halves")
    Seq(ev.filter(col("ts_us") <= mid), ev.filter(col("ts_us") > mid)).zipWithIndex.map {
      case (half, i) =>
        assert(half.count() > 0, "both time-halves must be non-empty")
        val scratch = tmp(s"graft_restart_h$i")
        half.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
        val listing = Files.list(scratch)
        val part =
          try {
            import scala.jdk.CollectionConverters._
            listing.iterator().asScala
              .find(_.getFileName.toString.endsWith(".parquet")).get
          } finally listing.close()
        val dest = hold.resolve(f"half$i%05d.parquet")
        Files.move(part, dest)
        dest
    }
  }

  /** Copies half `i` into the live source dir with an ascending mtime (the
    * file source processes oldest-modified first).
    */
  private def deliver(srcDir: Path, i: Int): Unit = {
    val dest = srcDir.resolve(halves(i).getFileName)
    Files.copy(halves(i), dest, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dest, FileTime.fromMillis(1000000000000L + i * 60000L))
  }

  /** One-file-per-microbatch streaming view of a staged dir, with the same
    * `ts_us`/`ts_utc` shape as `EventStreams.readEvents`.
    */
  private def eventsStream(srcDir: Path): DataFrame = {
    val schema = spark.read.parquet(halves(0).toString).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      .withColumn("ts_utc", timestamp_micros(col("ts_us")))
  }

  /** Runs `frame` to termination (AvailableNow) into a parquet file sink. */
  private def runPhase(frame: DataFrame, sink: Path, ckpt: Path,
                       noDataBatch: Boolean): Unit = {
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.getOption(key)
    spark.conf.set(key, noDataBatch.toString)
    try {
      val q = frame.writeStream.format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally prevNoData.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  private def joinPairs(sink: Path): Set[(Long, Option[Long])] =
    spark.read.parquet(sink.toString).select("imp_id", "click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet

  /** Restart harness for the two join replays: phase 1 sees only the first
    * time-half, terminates, phase 2 delivers the rest onto the same
    * checkpoint + sink; compared against an uninterrupted paced run and the
    * certified full-replay result.
    */
  private def joinRestartCase(mk: (DataFrame, DataFrame) => DataFrame,
                              noDataBatch: Boolean): (Set[(Long, Option[Long])],
                                                      Set[(Long, Option[Long])]) = {
    val srcR = tmp("graft_restart_src")
    val sinkR = tmp("graft_restart_sink")
    val ckptR = tmp("graft_restart_ckpt")
    deliver(srcR, 0)
    runPhase(mk(eventsStream(srcR), eventsStream(srcR)), sinkR, ckptR, noDataBatch)
    deliver(srcR, 1) // the "restore": same checkpoint, new data available
    runPhase(mk(eventsStream(srcR), eventsStream(srcR)), sinkR, ckptR, noDataBatch)

    val srcU = tmp("graft_restart_srcu")
    val sinkU = tmp("graft_restart_sinku")
    val ckptU = tmp("graft_restart_ckptu")
    deliver(srcU, 0); deliver(srcU, 1)
    runPhase(mk(eventsStream(srcU), eventsStream(srcU)), sinkU, ckptU, noDataBatch)
    (joinPairs(sinkR), joinPairs(sinkU))
  }

  test("q73 interval join: killed-and-restored replay equals uninterrupted and certified") {
    val (restarted, uninterrupted) =
      joinRestartCase(EventStreams.attributionPairsFrom, noDataBatch = false)
    assert(restarted == uninterrupted,
      s"restart diverged: only-restarted=${(restarted -- uninterrupted).take(5)} " +
        s"only-uninterrupted=${(uninterrupted -- restarted).take(5)}")
    val certified = EventStreams.attributionPairs(spark, dir)
      .select("imp_id", "click_id").collect()
      .map(r => (r.getLong(0), Option(r.getLong(1)))).toSet
    assert(restarted == certified && restarted.nonEmpty)
  }

  test("q80 outer join: killed-and-restored replay equals uninterrupted and certified") {
    val (restarted, uninterrupted) =
      joinRestartCase(EventStreams.attributionOuterFrom, noDataBatch = true)
    assert(restarted == uninterrupted,
      s"restart diverged: only-restarted=${(restarted -- uninterrupted).take(5)} " +
        s"only-uninterrupted=${(uninterrupted -- restarted).take(5)}")
    // the restarted replay must reproduce the certified protocol exactly:
    // matches plus outer nulls closed under the FINAL watermark — phase-1's
    // earlier flushes are a prefix of that set, never extra/missing rows
    val certified = EventStreams.attributionOuter(spark, dir)
      .select("imp_id", "click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(restarted == certified)
    assert(restarted.exists(_._2.isEmpty), "fixture must exercise outer nulls")
  }

  test("q98 upsert: killed-and-restored merge chain converges to the uninterrupted snapshot") {
    def upsertSrc(srcDir: Path) =
      eventsStream(srcDir).select("user_id", "ts_us", "event_id", "value")
    def snapRows(path: String): Set[(Long, Double, Long, Long)] =
      spark.read.parquet(path)
        .select("user_id", "value", "ts_us", "event_id").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet

    val srcR = tmp("graft_restart_upsrc")
    val baseR = tmp("graft_restart_upbase")
    deliver(srcR, 0)
    val phase1 = EventStreams.streamUpsertRun(spark, upsertSrc(srcR), baseR)
    deliver(srcR, 1)
    val restarted = EventStreams.streamUpsertRun(spark, upsertSrc(srcR), baseR)
    assert(restarted != phase1, "phase 2 must produce a new snapshot version")

    val srcU = tmp("graft_restart_upsrcu")
    val baseU = tmp("graft_restart_upbaseu")
    deliver(srcU, 0); deliver(srcU, 1)
    val uninterrupted = EventStreams.streamUpsertRun(spark, upsertSrc(srcU), baseU)

    val got = snapRows(restarted)
    assert(got == snapRows(uninterrupted) && got.nonEmpty)
    // independent batch oracle: last-writer-wins per user over all events
    val oracle = eventsUs
      .groupBy("user_id")
      .agg(max_by(struct(col("value"), col("ts_us"), col("event_id")),
        struct(col("ts_us"), col("event_id"))).as("_w"))
      .select(col("user_id"), col("_w.value").as("value"),
        col("_w.ts_us").as("ts_us"), col("_w.event_id").as("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == oracle)
  }
}
