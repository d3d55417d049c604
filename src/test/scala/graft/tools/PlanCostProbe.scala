package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch probe: split per-query latency into (re)planning vs execution by
  * counting a prebuilt DataFrame vs rebuilding it each rep.
  */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q11_star_join", "q42_dedup_simhash", "q05_join_inner")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm
      val df = fn(spark, sfDir)
      df.count() // materialize the plan once
      def med(f: () => Unit): Double = {
        val ts = (1 to 5).map { _ =>
          val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
        }.sorted
        ts(2)
      }
      val execOnly = med(() => df.count())
      val full = med(() => fn(spark, sfDir).count())
      println(f"PCOST $n%-28s exec=$execOnly%.3f full=$full%.3f replan=${full - execOnly}%.3f")
    }
    spark.stop()
  }
}
