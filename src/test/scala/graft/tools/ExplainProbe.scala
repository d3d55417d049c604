package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Print a query's formatted physical plan (post-execution, so AQE's final
  * plan shows) at the given SF dir. Args: query substrings.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- SparkEntry.freshQueries.keys.toSeq.sorted
         if args.exists(name.contains)) {
      val df = SparkEntry.freshQueries(name)(spark, sfDir)
      df.collect()
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
