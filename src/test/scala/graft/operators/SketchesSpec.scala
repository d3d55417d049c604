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

  test("log-bucket quantiles: γ relative-error bound vs exact ranks, partition-invariant") {
    val gamma = 1.02
    val li = Tables(spark, TestSpark.Sf0001).lineitem
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val sketch = Sketches.logHistQuantiles(li, "l_extendedprice", "l_returnflag", qs, gamma)
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(3))).toMap
    // exact rank quantiles per group (6k rows — sort locally)
    val byFlag = li.select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).filter(_ > 0).sorted }
    for ((flag, vals) <- byFlag; q <- qs) {
      val exact = vals(math.ceil(q * vals.length).toInt - 1)
      val est = sketch((flag, q))
      // bucket b contains the rank-⌈qn⌉ value x: γ^(b−1) < x ≤ γ^b, and the
      // reported boundary γ^b satisfies x ≤ est < x·γ (round-4 slack aside)
      assert(est >= exact - 1e-4 && est <= exact * gamma + 1e-4,
        s"$flag q=$q: est $est outside [$exact, ${exact * gamma}]")
    }
    // additive counts ⇒ the sketch cannot move with partitioning
    val again = Sketches.logHistQuantiles(li.repartition(13), "l_extendedprice",
      "l_returnflag", qs, gamma)
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(3))).toMap
    assert(again == sketch)
  }
}
