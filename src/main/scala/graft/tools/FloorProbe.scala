package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Scratch probe: decompose the fixed per-query cost (scheduler, scan, AQE,
  * shuffle) that dominates sub-second queries at bench scale.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)

    def med(name: String, reps: Int = 7)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"FLOOR $name%-46s med=${ts(ts.size / 2)}%.4f min=${ts.head}%.4f")
    }

    med("empty job (range(1).count)") { spark.range(1).count() }
    med("32-task noop (range->repartition count)") {
      spark.range(1000).repartition(32).count()
    }
    med("lineitem count (staged, 32 files)") { t.lineitem.count() }
    med("lineitem 1-col sum") { t.lineitem.agg(sum("l_quantity")).collect() }
    med("customer count (single file)") { t.customer.count() }
    med("join c-o count (AQE on)") {
      t.customer.join(t.orders, col("c_custkey") === col("o_custkey")).count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    med("join c-o count (AQE off)") {
      t.customer.join(t.orders, col("c_custkey") === col("o_custkey")).count()
    }
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    med("join c-o count (AQE off, 8 parts)") {
      t.customer.join(t.orders, col("c_custkey") === col("o_custkey")).count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    med("join c-o count (AQE on, 8 parts)") {
      t.customer.join(t.orders, col("c_custkey") === col("o_custkey")).count()
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    med("agg 147k groups double (AQE on, 32)") {
      t.lineitem.groupBy("l_orderkey").agg(sum("l_extendedprice")).count()
    }
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    med("agg 147k groups double (AQE on, 8)") {
      t.lineitem.groupBy("l_orderkey").agg(sum("l_extendedprice")).count()
    }
    spark.stop()
  }
}
