package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch probe (round 12): per-query wall under BOTH presentation-sort
  * modes at a given SF dir — `single` (repartition(1) + in-partition sort,
  * the default) vs `range` (distributed orderBy). The single-partition
  * merge is right for small results (no sampling pass, no range exchange)
  * but serializes the tail of FACT-SIZED outputs (1M+ rows at sf1) through
  * one core; q10 already picked orderBy for exactly that reason. Args:
  * [reps] [query substrings...].
  */
object SortModeProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val filters = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.freshQueries.keys.toSeq.sorted
      .filter(n => filters.isEmpty || filters.exists(n.contains))
    for (name <- names) {
      val fn = SparkEntry.freshQueries(name)
      val out = Seq(true, false).map { single =>
        spark.conf.set("spark.graft.presentationSort", single.toString)
        val ts = (1 to (reps + 1)).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).collect()
          (System.nanoTime() - t0) / 1e9
        }.drop(1).sorted
        f"${if (single) "single" else "range"}: med=${ts(ts.size / 2)}%.3f min=${ts.head}%.3f"
      }
      spark.conf.set("spark.graft.presentationSort", "true")
      println(f"SORTMODE $name%-28s ${out.mkString("  ")}")
    }
    spark.stop()
  }
}
