package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CMS estimates bound the true counts from above, within eps*N") {
    val li = Tables(spark, TestSpark.Sf0001).lineitem
    val n = li.count()
    val eps = 0.001
    val truth = li.filter(col("l_suppkey") <= 20)
      .groupBy("l_suppkey").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = Sketches.cmsEstimates(li, "l_suppkey", (1L to 20L).toSeq, eps = eps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 20L).foreach { k =>
      val t = truth.getOrElse(k, 0L)
      assert(est(k) >= t, s"CMS must never undercount: key $k est ${est(k)} < $t")
      assert(est(k) <= t + (eps * n).toLong + 1,
        s"key $k est ${est(k)} exceeds the eps*N bound over $t")
    }
  }

  test("CMS estimates are seed-deterministic") {
    val li = Tables(spark, TestSpark.Sf0001).lineitem
    val a = Sketches.cmsEstimates(li, "l_suppkey", Seq(1L, 5L, 9L)).collect().toSeq
    val b = Sketches.cmsEstimates(li, "l_suppkey", Seq(1L, 5L, 9L)).collect().toSeq
    assert(a == b)
  }
}
