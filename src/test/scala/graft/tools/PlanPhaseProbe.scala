package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch probe: split fresh-plan query time into builder / analysis /
  * optimization / physical planning / execution using QueryPlanningTracker.
  */
object PlanPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q47_text_langid", "q68_dedup_levenshtein", "q19_window_frame",
               "q10_join_range", "q58_grouping_sets", "q39_correlated_subquery",
               "q13_agg_hash", "q24_string_fns", "q05_join_inner")
    names.foreach { n =>
      val fn = SparkEntry.freshQueries(n)
      fn(spark, sfDir).collect() // warm
      // timed: fresh build + collect, phases from the tracker
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.collect()
      val t2 = System.nanoTime()
      val phases = df.queryExecution.tracker.phases.map { case (p, s) =>
        f"$p=${(s.endTimeMs - s.startTimeMs)}%dms" }.mkString(" ")
      println(f"PHASE $n%-28s build=${(t1 - t0) / 1e6}%.0fms exec=${(t2 - t1) / 1e6}%.0fms  $phases")
    }
    spark.stop()
  }
}
