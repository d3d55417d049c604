package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.streaming.EventStreams

/** Scratch probe: does the streaming replay floor amortize? Replays the
  * sf0.1 events (100k rows) and a 10× copy (1M rows) through the same
  * tumbling-window pipeline and reports wall seconds + rows/sec. If the
  * per-query cost is machinery (offset WAL, planning, state-store setup)
  * rather than data, the 10× replay should cost far less than 10× the
  * wall — which is what a long-lived cluster deployment amortizes away.
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 10× events staged once: shift event time per copy so windows stay dense
    val big = s"${EventStreams.scratchBase}/graft_events_10x"
    if (!new java.io.File(s"$big/events.parquet").exists()) {
      val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      val ten = (0 until 10).map(i =>
        ev.withColumn("ts", col("ts") + expr(s"${i}L * 86400000000000"))
          .withColumn("event_id", col("event_id") + lit(i * 100000000L)))
        .reduce(_ unionAll _)
      new java.io.File(big).mkdirs()
      ten.coalesce(1).write.mode("overwrite")
        .parquet(s"$big/events.parquet.dir")
      // the streaming reader stages from <dir>/events.parquet (a file) — copy
      val part = new java.io.File(s"$big/events.parquet.dir").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$big/events.parquet"))
    }

    def run(dir: String, tag: String): Unit = {
      EventStreams.tumblingCounts(spark, dir).count() // warm + stage
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        EventStreams.tumblingCounts(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = ts(1)
      val rows = spark.read.parquet(s"$dir/events.parquet").count()
      println(f"STREAMSCALE $tag%-6s rows=$rows%8d wall=$med%5.2f s  throughput=${rows / med / 1e6}%5.2f M rows/s")
    }
    run("/root/testdata/sf0.1", "1x")
    run(big, "10x")
    spark.stop()
  }
}
