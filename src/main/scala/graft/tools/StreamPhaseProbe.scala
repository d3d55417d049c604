package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.EventStreams

/** Scratch probe: per-phase breakdown of one streaming replay (q60) from the
  * engine's own progress metrics, plus config sweeps on the replay floor.
  */
object StreamPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def one(n: String): Double = {
      val t0 = System.nanoTime()
      EventStreams.queries(n)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    EventStreams.queries.keys.foreach(one) // warm

    for (parts <- Seq("4", "2", "1")) {
      spark.conf.set("spark.graft.stream.partitions", parts)
      val t = EventStreams.queries.keys.toSeq.sorted.map(n => n -> one(n))
      println(f"SWEEP parts=$parts total=${t.map(_._2).sum}%5.2f " +
        t.map { case (n, s) => f"${n.stripPrefix("q6").take(10)}=$s%4.2f" }.mkString(" "))
    }
    spark.conf.set("spark.graft.stream.partitions", "2")
    spark.conf.set("spark.graft.stream.debugProgress", "true")
    one("q60_stream_tumbling")
    spark.stop()
  }
}
