package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Scratch probe (round 13): is the ' +' regex split the token-family
  * bottleneck, or the explode + exchange machinery behind it?
  */
object SplitCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, dir).documents
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.collect()
      val xs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); df.collect(); (System.nanoTime() - t0) / 1e9
      }
      println(f"SPLITPROBE $name%-18s min=${xs.min}%.3f med=${xs.sorted.apply(2)}%.3f")
    }
    t("scan_len")(docs.agg(sum(length(col("text"))).as("s")))
    t("split_only")(docs.agg(sum(size(split(trim(col("text")), " +"))).as("s")))
    t("split_explode")(docs.select(explode(split(trim(col("text")), " +")).as("t"))
      .agg(count(lit(1)).as("n")))
    t("tok_exchange")(docs.select(explode(split(trim(col("text")), " +")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n")).agg(sum("n").as("s")))
    spark.stop()
  }
}
