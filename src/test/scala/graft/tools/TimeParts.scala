package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.functions.Exact

/** Dev tool: time q11 building blocks (second run reported). */
object TimeParts {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      f; val t0 = System.nanoTime(); val n = f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    time("lineitem scan count") { t.lineitem.count() }
    time("agg double sum by orderkey") {
      t.lineitem.groupBy("l_orderkey").agg(sum(col("l_extendedprice"))).count()
    }
    time("agg decimal revenue by orderkey") {
      t.lineitem.groupBy("l_orderkey")
        .agg(Exact.drevenueSum(col("l_extendedprice"), col("l_discount"))).count()
    }
    time("building orders join only") {
      t.customer.filter(col("c_mktsegment") === "BUILDING")
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .select("o_orderkey").count()
    }
    time("full q11") {
      graft.queries.Relational.queries("q11_star_join")(spark, "/root/testdata/sf0.1").count()
    }
    time("q17 window rank") {
      graft.queries.Relational.queries("q17_window_rank")(spark, "/root/testdata/sf0.1").count()
    }
    spark.stop()
  }
}
