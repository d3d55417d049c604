package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.EventStreams

/** Scratch probe: does map-side session merging help the q62 replay? */
object SessionMergeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def one(): Double = {
      val t0 = System.nanoTime()
      EventStreams.queries("q62_stream_session")(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    one(); one()
    for (lm <- Seq("false", "true", "false", "true")) {
      spark.conf.set("spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition", lm)
      val ts = (1 to 5).map(_ => one()).sorted
      println(f"SMERGE lm=$lm min=${ts.head}%.3f med=${ts(2)}%.3f")
    }
    spark.stop()
  }
}
