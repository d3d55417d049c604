package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class ScaleLayoutsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("latest-snapshot read prunes older partitions out of the scan") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val t = Tables(spark, TestSpark.Sf0001)
    ScaleLayouts.writeSnapshot(t.nation, root, LocalDate.of(2024, 1, 1))
    ScaleLayouts.writeSnapshot(t.nation.withColumn("n_name", upper(col("n_name"))),
      root, LocalDate.of(2024, 2, 1))
    val latest = ScaleLayouts.readLatestSnapshot(spark, root)
    // pruning happens at physical planning: the scan carries a partition
    // filter (inputFiles would show the unpruned logical file index)
    val plan = latest.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("20240201"),
      s"expected a partition-pruned scan:\n$plan")
    assert(latest.count() == 25)
    // and the data really is the second snapshot
    assert(latest.filter(col("n_name") =!= upper(col("n_name"))).count() == 0)
  }

  test("bucketed tables join with zero shuffle exchange") {
    val t = Tables(spark, TestSpark.Sf0001)
    ScaleLayouts.writeBucketed(t.orders, "orders_b", "o_custkey", 8)
    ScaleLayouts.writeBucketed(t.customer, "customer_b", "c_custkey", 8)
    // force a non-broadcast join so co-location is what's being tested
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ScaleLayouts.coLocatedJoin(spark, "customer_b", "orders_b",
        "c_custkey", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free plan:\n$plan")
      assert(joined.count() == t.customer.join(t.orders,
        col("c_custkey") === col("o_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
