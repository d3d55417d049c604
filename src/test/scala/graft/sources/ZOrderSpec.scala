package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("morton16 interleaves bits") {
    val s = spark
    import s.implicits._
    val out = Seq((0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535))
      .toDF("a", "b")
      .select(ScaleLayouts.morton16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (3,5): a-bits 1,1 at even positions 0,2; b-bits 1,0,1 at odd 1,3,5 →
    // 0b100111 = 39
    assert(out == Seq(0L, 1L, 2L, 39L, (1L << 32) - 1))
  }

  test("z-ordered layout keeps rows and clusters BOTH dimensions per file") {
    val t = Tables(spark, "/root/testdata/sf0.01")
    val orders = t.orders
      .withColumn("d1", (col("o_custkey") % 4096).cast("int"))
      .withColumn("d2", (dayofyear(col("o_orderdate")) * 11 % 4096).cast("int"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val nFiles = 16
    ScaleLayouts.writeZOrdered(orders, "d1", "d2", nFiles, dir)
    val back = spark.read.parquet(dir)
    // lossless: same multiset of orders
    assert(back.count() == orders.count())
    assert(back.agg(sum("o_orderkey")).head.getLong(0) ==
      orders.agg(sum("o_orderkey")).head.getLong(0))
    // per-file rectangles: on the z-curve, each of the 16 files covers a
    // bounded rectangle in (d1, d2) — the mean per-file span of EACH
    // dimension must be well under the global span (a single-key range
    // layout would show a near-global span on the other dimension)
    val files = back.inputFiles
    assert(files.length >= nFiles / 2, s"expected a multi-file layout: ${files.length}")
    def meanSpan(dim: String): Double = {
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(dim)).as("lo"), max(col(dim)).as("hi")).head
        (r.getInt(1) - r.getInt(0)).toDouble
      }
      spans.sum / spans.length
    }
    val globalSpan = 4096.0
    val s1 = meanSpan("d1")
    val s2 = meanSpan("d2")
    assert(s1 < globalSpan / 2, s"d1 not clustered: mean file span $s1")
    assert(s2 < globalSpan / 2, s"d2 not clustered: mean file span $s2")
  }
}
