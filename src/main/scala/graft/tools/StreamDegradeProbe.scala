package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.EventStreams

/** Scratch probe: does replay latency degrade with replay count in-session? */
object StreamDegradeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = EventStreams.queries("q60_stream_tumbling")
    val ts = (1 to 24).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      f"$t%.2f"
    }
    println("DEGRADE q60 x24: " + ts.mkString(" "))
    spark.stop()
  }
}
