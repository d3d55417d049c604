package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Scratch probe: what EXACTLY does Spark drop for append-mode windowed
  * aggregation? Candidate rules:
  *   (a) rows whose window end <= current watermark (dropped even if the
  *       window was never emitted);
  *   (b) only rows for windows already emitted in a PRIOR batch.
  */
object LateDropProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    val mem = MemoryStream[Timestamp]
    val agg = mem.toDF().toDF("ts_utc")
      .withWatermark("ts_utc", "10 minutes")
      .groupBy(window(col("ts_utc"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w"), col("cnt"))
    val name = s"latedrop_probe_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(name).outputMode("append").start()
    // batch 0: hours 0..5 on time, one row each; max 05:30 → wm 05:20
    mem.addData((0 to 5).map(h => ts(h, 30)): _*)
    q.processAllAvailable()
    // batch 1: LATE row in hour 0 (end 01:00 <= wm 05:20, window NOT yet
    // emitted) + on-time row hour 6. End of batch: windows <= 05:20 emitted.
    mem.addData(ts(0, 10), ts(6, 0))
    q.processAllAvailable()
    // batch 2: late row in hour 0 again — its window WAS emitted in batch 1.
    // Also push wm forward with hour 8.
    mem.addData(ts(0, 20), ts(8, 0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq.sorted
    println(s"LATEDROP rows=$rows")
    println("LATEDROP hour0 cnt list = " + rows.filter(_._1.startsWith("2024-01-01 00")).map(_._2).mkString(","))
    spark.stop()
  }
}
