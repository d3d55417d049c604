package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Scratch probe: does the runtime bloom-filter join-pruning rule inject
  * with lowered thresholds on the fixture data, and what does the plan
  * show?
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("bloom enabled=" + spark.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"))
    // creationSideThreshold is a MAX (the dim side must be smaller);
    // applicationSideScanSizeThreshold is a MIN (the fact scan must be bigger)
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // the rule skips creation sides it could broadcast instead
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // selective dim side: part rows with a narrow filter; fact side lineitem
    val t = Tables(spark, sfDir)
    val dim = t.part.filter(col("p_retailprice") > 1900).select("p_partkey")
    val q = t.lineitem.join(dim.hint("shuffle_hash"), col("l_partkey") === col("p_partkey"))
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.optimizedPlan.toString
    println("HAS_BLOOM=" + plan.contains("bloom"))
    println(plan.take(3000))
    q.collect()
    spark.stop()
  }
}
