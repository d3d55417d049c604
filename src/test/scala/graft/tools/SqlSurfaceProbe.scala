package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Scratch probe: does this Spark build support SQL-defined functions
  * (CREATE TEMPORARY FUNCTION ... RETURN expr) and correlated LATERAL
  * subqueries with LIMIT?
  */
object SqlSurfaceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val spark = SparkEntry.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, sfDir).orders.createOrReplaceTempView("orders_v")
    Tables(spark, sfDir).customer.createOrReplaceTempView("customer_v")

    try {
      spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION rev(price DOUBLE, disc DOUBLE) RETURNS DOUBLE RETURN price * (1.0 - disc)")
      val r = spark.sql("SELECT rev(100.0, 0.1) AS x").collect()(0).getDouble(0)
      println(s"SQLUDF_SCALAR ok x=$r")
    } catch { case e: Throwable => println(s"SQLUDF_SCALAR fail: ${e.getMessage.take(200)}") }

    try {
      spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION top_orders(ck BIGINT) RETURNS TABLE(o_orderkey BIGINT)
                   RETURN SELECT o_orderkey FROM orders_v WHERE o_custkey = ck ORDER BY o_totalprice DESC, o_orderkey LIMIT 2""")
      val n = spark.sql("SELECT c_custkey, t.o_orderkey FROM customer_v, LATERAL top_orders(c_custkey) t").count()
      println(s"SQLUDF_TABLE ok n=$n")
    } catch { case e: Throwable => println(s"SQLUDF_TABLE fail: ${e.getMessage.take(200)}") }

    try {
      val n = spark.sql("""SELECT c.c_custkey, t.o_orderkey FROM customer_v c,
                           LATERAL (SELECT o_orderkey FROM orders_v o WHERE o.o_custkey = c.c_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""").count()
      println(s"LATERAL_LIMIT ok n=$n")
    } catch { case e: Throwable => println(s"LATERAL_LIMIT fail: ${e.getMessage.take(200)}") }
    spark.stop()
  }
}
