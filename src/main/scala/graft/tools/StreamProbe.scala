package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.streaming.EventStreams

/** Scratch probe: per-config streaming replay timings (not part of the
  * declared surface; used to size the microbatch floor).
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // warm up the whole path once
    EventStreams.queries("q62_stream_session")(spark, sfDir).count()

    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    spark.conf.set("spark.graft.stream.partitions", "2")

    // minimal machinery floor: passthrough stream, no state
    import org.apache.spark.sql.streaming.Trigger
    def passthrough(): Unit = {
      val name = s"probe_pt_${System.nanoTime()}"
      val q = EventStreams.readEvents(spark, sfDir).select("event_id")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).count()
    }
    passthrough() // warm
    time("passthrough-1")(passthrough())
    time("passthrough-2")(passthrough())

    // progress breakdown of the expensive one
    val name = s"probe_q62_${System.nanoTime()}"
    val agg = EventStreams.readEvents(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.session_window(
        org.apache.spark.sql.functions.col("ts_utc"), "30 minutes"),
        org.apache.spark.sql.functions.col("user_id"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"))
    val t0 = System.nanoTime()
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    println(f"PROBE q62-raw ${(System.nanoTime() - t0) / 1e9}%.3f s")
    q.recentProgress.foreach(p => println("PROBE progress " + p.json))
    spark.stop()
  }
}
