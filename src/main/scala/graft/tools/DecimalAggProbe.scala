package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkEntry, Tables}

/** Scratch probe: cost of exact-decimal aggregation buffers vs long-cents. */
object DecimalAggProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables(spark, "/root/testdata/sf0.1").lineitem

    def med(name: String, reps: Int = 7)(f: => Unit): Unit = {
      f
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"DAGG $name%-40s med=${ts(ts.size / 2)}%.4f min=${ts.head}%.4f")
    }

    med("sum double (baseline, inexact)") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice")).collect()
    }
    med("sum decimal(18,2) [current dsum]") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))),
             sum(col("l_extendedprice").cast(DecimalType(18, 2)))).collect()
    }
    med("sum decimal(8,2) [compact buffer]") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(DecimalType(8, 2))),
             sum(col("l_extendedprice").cast(DecimalType(8, 2)))).collect()
    }
    med("sum long cents") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg((sum(round(col("l_quantity") * 100).cast(LongType)) / 100.0),
             (sum(round(col("l_extendedprice") * 100).cast(LongType)) / 100.0)).collect()
    }
    spark.stop()
  }
}
