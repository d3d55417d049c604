package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The publication contract for streaming results backed by on-disk files
  * (q98 streamUpsert, q83 fileSinkCounts): the caller gets a LAZY read of a
  * StageDir-published, signature-pinned directory — no driver collect, no
  * single-task write — and the frame stays readable after later runs sweep
  * the (released) run scratch it was computed in.
  */
class StreamPublishSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val fixtureTags = scala.collection.mutable.ArrayBuffer.empty[String]

  /** A private copy of the events fixture: its dir tag + mtime signature key
    * the published dirs, so this suite never shares published state with
    * other suites or earlier JVMs.
    */
  private def freshFixture(): String = {
    val d = Files.createTempDirectory("graft_pubspec_")
    Files.copy(Paths.get(TestSpark.Sf0001, "events.parquet"),
      d.resolve("events.parquet"))
    fixtureTags += Integer.toHexString(d.toString.hashCode)
    d.toString
  }

  /** Random-tag fixtures would otherwise leave one orphaned published dir
    * + staged layout in tmpfs per suite run (dropSuperseded only reclaims
    * same-tag siblings).
    */
  override def afterAll(): Unit = {
    import scala.jdk.CollectionConverters._
    val ls = Files.list(Paths.get(graft.StageDir.scratchBase))
    try ls.iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        fixtureTags.exists(t => n.contains(s"_x$t.") || n.contains(s"_$t."))
      }
      .foreach(p => try graft.StageDir.deleteRecursively(p) catch { case _: Exception => () })
    finally ls.close()
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("q98: lazy scan of the published snapshot — no LocalRelation, volume-sized files") {
    val dir = freshFixture()
    // 15 users (sf0.001) at 5 rows/partition → the published write must
    // produce >=3 part files: partitions are sized to snapshot volume, not
    // coalesce(1)
    spark.conf.set("spark.graft.upsert.rowsPerPartition", "5")
    try {
      val df = EventStreams.streamUpsert(spark, dir)
      val plan = df.queryExecution.optimizedPlan
      assert(plan.collect { case l: LocalRelation => l }.isEmpty,
        s"driver-materialized result leaked back in:\n$plan")
      assert(planOf(df).contains("graft_upsert_snap_x"), planOf(df))
      val tag = Integer.toHexString(dir.hashCode)
      val pub = {
        val ls = Files.list(Paths.get(graft.StageDir.scratchBase))
        try {
          import scala.jdk.CollectionConverters._
          ls.iterator().asScala
            .filter(_.getFileName.toString.startsWith(s"graft_upsert_snap_x$tag."))
            .toList
        } finally ls.close()
      }
      assert(pub.size == 1, s"expected exactly one published snapshot: $pub")
      val partFiles = {
        val ls = Files.list(pub.head)
        try {
          import scala.jdk.CollectionConverters._
          ls.iterator().asScala.count(_.getFileName.toString.startsWith("part-"))
        } finally ls.close()
      }
      assert(partFiles >= 3, s"expected a volume-sized multi-file write, got $partFiles")
      // values: the order-independent upsert converges on the batch argmax
      val exp = graft.Tables(spark, dir).eventsUs
        .groupBy("user_id")
        .agg(max_by(struct(col("value"), col("ts_us"), col("event_id")),
          struct(col("ts_us"), col("event_id"))).as("_w"))
        .select(col("user_id"), col("_w.value").as("value"),
          col("_w.ts_us").as("ts_us"), col("_w.event_id").as("event_id"))
        .orderBy("user_id").collect().toSeq
      assert(df.collect().toSeq == exp)
    } finally spark.conf.unset("spark.graft.upsert.rowsPerPartition")
  }

  test("certification is regression-sensitive: a changed result on an UNCHANGED fixture republishes") {
    import spark.implicits._
    // The publish identity q83/q98 use is fixtureSig + content hash of the
    // FRESH result. A logic change that alters the result therefore lands in
    // a NEW published dir even when the fixture is byte-identical — Verify
    // can never certify the pre-change copy. This drives the exact call
    // shape of the two operators with the "logic change" simulated as a
    // different fresh frame under the same fixture signature.
    val base = s"graft_pubspec_cert_${java.util.UUID.randomUUID().toString.take(8)}"
    val fixtureSig = "777:123456" // identical across both simulated builds
    def publishOf(df: DataFrame): java.nio.file.Path =
      graft.StageDir.publish(base, s"$fixtureSig:c${EventStreams.contentSig(df)}") { tmp =>
        df.write.mode("overwrite").parquet(tmp.toString)
      }
    try {
      val d1 = publishOf(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      // unchanged logic: row order must not perturb the signature (the
      // stream's output partition order is nondeterministic)
      assert(publishOf(Seq((2L, "b"), (1L, "a")).toDF("k", "v")) == d1,
        "content signature must be order-independent")
      // "logic change" on the unchanged fixture: result differs → republish
      val d2 = publishOf(Seq((1L, "a"), (2L, "CHANGED")).toDF("k", "v"))
      assert(d2 != d1, "a changed result on an unchanged fixture must get a fresh publish")
      assert(!Files.exists(d1), "the stale published copy must be dropped once the new one is live")
      assert(spark.read.parquet(d2.toString).orderBy("k").as[(Long, String)].collect().toSeq
        == Seq((1L, "a"), (2L, "CHANGED")),
        "the certified read must reflect the NEW result, not the stale copy")
      // row-count changes alone (same per-row hashes could never sum equal
      // here, but pin the n component explicitly too)
      val d3 = publishOf(Seq((1L, "a")).toDF("k", "v"))
      assert(d3 != d2)
    } finally {
      import scala.jdk.CollectionConverters._
      val ls = Files.list(Paths.get(graft.StageDir.scratchBase))
      try ls.iterator().asScala
        .filter(_.getFileName.toString.startsWith(base))
        .foreach(p => try graft.StageDir.deleteRecursively(p) catch { case _: Exception => () })
      finally ls.close()
    }
  }

  test("q98/q83: earlier frames survive a later run's scratch sweep") {
    val dir = freshFixture()
    val up1 = EventStreams.streamUpsert(spark, dir)
    val upRows = up1.collect().toSeq
    val fs1 = EventStreams.fileSinkCounts(spark, dir)
    assert(planOf(fs1).contains("graft_filesink_snap_x"), planOf(fs1))
    val fsRows = fs1.collect().toSeq
    // the second runs sweep the first runs' (released) scratch; the frames
    // above read the published copies and must be unaffected
    EventStreams.streamUpsert(spark, dir).collect()
    EventStreams.fileSinkCounts(spark, dir).collect()
    assert(up1.collect().toSeq == upRows)
    assert(fs1.collect().toSeq == fsRows)
  }
}
