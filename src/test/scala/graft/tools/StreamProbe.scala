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
        .config("spark.local.dir", EventStreams.scratchBase)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = EventStreams.queries.keys.toSeq.sorted

    def runAll(): Map[String, Double] = names.map { n =>
      val t0 = System.nanoTime()
      EventStreams.queries(n)(spark, sfDir).collect()
      n -> (System.nanoTime() - t0) / 1e9
    }.toMap

    runAll() // warm codegen + staging

    for (p <- Seq("4", "8", "16"); lm <- Seq("false", "true"); rep <- Seq(1, 2)) {
      spark.conf.set("spark.graft.stream.partitions", p)
      spark.conf.set("spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition", lm)
      val t = runAll()
      val total = t.values.sum
      println(f"PROBE p=$p lm=$lm rep=$rep total=$total%6.2f  " +
        t.toSeq.sorted.map { case (n, s) => f"${n.stripPrefix("q6").take(12)}=$s%4.2f" }.mkString(" "))
    }

    // engine-reported phase breakdown for the slowest replay
    spark.conf.set("spark.graft.stream.partitions", "8")
    spark.conf.set("spark.graft.stream.debugProgress", "true")
    EventStreams.queries("q62_stream_session")(spark, sfDir).collect()
    spark.stop()
  }
}
