package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch probe: is a query slower when interleaved with other queries than
  * when run back-to-back? Distinguishes session/JIT/cache pollution from
  * host noise.
  */
object InterleaveProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.local.dir", graft.streaming.EventStreams.scratchBase)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val target = "q05_join_inner"
    val others = Seq("q13_agg_hash", "q17_window_rank", "q25_date_fns",
      "q29_json_get", "q40_dedup_exact", "q47_text_langid", "q36_cube",
      "q10_join_range", "q21_topk", "q57_percentile")
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.freshQueries(n)(spark, sfDir).collect()
      (System.nanoTime() - t0) / 1e9
    }
    run(target); others.foreach(run) // warm all
    val solo = (1 to 8).map(_ => run(target))
    println(f"ILV solo   : ${solo.map(t => f"$t%.3f").mkString(" ")}")
    val inter = (1 to 8).map { _ => others.foreach(run); run(target) }
    println(f"ILV mixed  : ${inter.map(t => f"$t%.3f").mkString(" ")}")
    val solo2 = (1 to 8).map(_ => run(target))
    println(f"ILV solo2  : ${solo2.map(t => f"$t%.3f").mkString(" ")}")
    spark.stop()
  }
}
