package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

/** The salted join's contract: identical result set to the plain join,
  * different shuffle distribution — and the adaptive entry point must
  * pick the salted path only when the key histogram is actually skewed.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one key holds half the mass — pathological skew
  private def skewedBig = (1 to 20000).map { i =>
    val k = if (i % 2 == 0) 7L else (i % 500).toLong
    (k, i.toLong)
  }.toDF("k", "v")

  private def uniformBig = (1 to 20000).map(i => ((i % 500).toLong, i.toLong))
    .toDF("k", "v")

  private def small = (0L to 499L).map(k => (k, s"dim_$k")).toDF("dk", "name")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("k"), col("v"), col("name"))
      .collect().map(_.mkString("|")).sorted.toSeq

  test("salted join returns exactly the plain join's rows on a skewed frame") {
    val plain = skewedBig.join(small, col("k") === col("dk"))
    val salted = SkewJoin.saltedInnerJoin(skewedBig, small, "k", "dk", nSalts = 8)
    assert(canon(salted) == canon(plain))
  }

  test("adaptive join salts the skewed frame and stays plain on uniform keys") {
    // decision surface: the salted plan carries the _salt scatter column in
    // its physical join condition; the plain plan must not
    val saltedPlan = SkewJoin.adaptiveInnerJoin(
      skewedBig, small, "k", "dk", nSalts = 8, sampleFraction = 0.5)
      .queryExecution.analyzed.toString
    assert(saltedPlan.contains("_salt"), "skewed frame must take the salted path")

    val plainPlan = SkewJoin.adaptiveInnerJoin(
      uniformBig, small, "k", "dk", nSalts = 8, sampleFraction = 0.5)
      .queryExecution.analyzed.toString
    assert(!plainPlan.contains("_salt"), "uniform frame must stay a plain join")

    // and both decisions produce the plain join's rows
    val plain = skewedBig.join(small, col("k") === col("dk"))
    assert(canon(SkewJoin.adaptiveInnerJoin(
      skewedBig, small, "k", "dk", nSalts = 8, sampleFraction = 0.5)) == canon(plain))
  }

  test("tiny frames stay plain regardless of shape (below minSample)") {
    val tiny = Seq((7L, 1L), (7L, 2L), (7L, 3L)).toDF("k", "v")
    val plan = SkewJoin.adaptiveInnerJoin(
      tiny, small, "k", "dk", nSalts = 8, sampleFraction = 1.0)
      .queryExecution.analyzed.toString
    assert(!plan.contains("_salt"))
  }
}
