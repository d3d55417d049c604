package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExactSpec extends AnyFunSuite {

  test("dsum is exact and independent of partitioning") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // values with awkward binary representations
    val vals = (1 to 10000).map(i => (i % 100) / 100.0 + i * 0.01)
    val expected = BigDecimal(vals.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
    val results = Seq(1, 3, 7, 32).map { n =>
      vals.toDF("v").repartition(n).agg(Exact.dsum(col("v"))).as[Double].head()
    }
    assert(results.distinct.size == 1, s"partitioning changed the sum: $results")
    assert(math.abs(results.head - expected.toDouble) < 1e-9)
  }

  test("davg equals sum/count exactly") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq(1.25, 2.50, 3.75).toDF("v")
    val avg = df.agg(Exact.davg(col("v"))).as[Double].head()
    assert(avg == 7.50 / 3)
  }

  test("vector cosine of identical vectors is 1 and is symmetric") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    ).toDF("a", "b")
    val sims = df.select(
      VectorFunctions.cosine(col("a"), col("b")).as("ab"),
      VectorFunctions.cosine(col("b"), col("a")).as("ba"))
      .as[(Double, Double)].collect()
    assert(math.abs(sims(0)._1 - 1.0) < 1e-12)
    assert(sims(1)._1 == 0.0)
    assert(sims.forall { case (x, y) => x == y })
  }
}
