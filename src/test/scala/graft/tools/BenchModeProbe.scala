package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Scratch probe: compare bench measurement modes for honesty + floor cost.
  * If re-collecting a cached AQE plan reuses materialized shuffles, its
  * re-run time will collapse vs the fresh-plan time.
  */
object BenchModeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)

    def med(name: String, reps: Int = 9)(f: => Unit): Unit = {
      f
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"BMODE $name%-52s med=${ts(ts.size / 2)}%.4f min=${ts.head}%.4f")
    }

    def bigAgg = t.lineitem.join(
        t.orders.filter(col("o_orderdate") >= "1995-01-01"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(sum("l_extendedprice").as("s"))
      .orderBy(col("s").desc).limit(20)

    val cached = bigAgg // one DF instance, reused
    med("cached DF .count()  [current bench]") { cached.count() }
    med("cached DF .collect() [reuse suspicion]") { cached.collect() }
    med("fresh plan .collect() [build df each rep]") { bigAgg.collect() }
    // how much is pure planning?
    med("plan only (fresh df, executedPlan forced)") {
      bigAgg.queryExecution.executedPlan
    }
    spark.stop()
  }
}
