package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.functions.Exact

/** Scratch probe (round 13): q39's decorrelated shape A/B — aggregate +
  * self-join (two custkey exchanges) vs one unbounded window over a single
  * custkey exchange. Same rows by construction; interleaved reps.
  */
object CorrSubqShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = graft.Tables(spark, dir).orders
    def joined() = {
      val perCust = o.groupBy(col("o_custkey").as("k"))
        .agg(Exact.davg(col("o_totalprice")).as("avg_price"))
      o.join(perCust, col("o_custkey") === col("k"))
        .filter(col("o_totalprice") > col("avg_price"))
        .select("o_orderkey")
    }
    def windowed() = {
      val w = Window.partitionBy("o_custkey")
      o.withColumn("avg_price", Exact.davgOver(col("o_totalprice"), w))
        .filter(col("o_totalprice") > col("avg_price"))
        .select("o_orderkey")
    }
    def once(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); f().collect(); (System.nanoTime() - t0) / 1e9
    }
    val a = once(joined _); val b = once(windowed _)
    require(joined().count() == windowed().count(), "row count mismatch")
    val (js, ws) = (1 to 5).map(_ => (once(joined _), once(windowed _))).unzip
    println(f"CORRSUBQ joined   min=${js.min}%.3f med=${js.sorted.apply(2)}%.3f (warm $a%.3f)")
    println(f"CORRSUBQ windowed min=${ws.min}%.3f med=${ws.sorted.apply(2)}%.3f (warm $b%.3f)")
    spark.stop()
  }
}
